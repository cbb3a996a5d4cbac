"""Pure single-process core: the sequential oracle the Ray pipeline must match."""
