"""Sources: corpus loaders, snapshot catalog, and config-driven view registry."""
