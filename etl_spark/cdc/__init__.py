"""CDC engine core: change-log -> dedup -> CoW MERGE -> snapshot lake table."""
