"""Write-path framework (SURVEY §2.2): partitioned lake writes with
hypertable-style time partitioning, schema evolution, dedup-on-write,
and the metadata catalog."""
