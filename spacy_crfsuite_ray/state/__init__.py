"""Model artifacts: CRF training, save/load, per-actor state."""
