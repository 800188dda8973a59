"""Source connectors: typed readers over the lake / driver test tables."""
