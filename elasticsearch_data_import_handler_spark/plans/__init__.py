"""Build plans: index construction, incremental merge, state/lineage."""
