"""End-to-end Dataset pipeline assembly."""
