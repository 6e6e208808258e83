"""Table IO + checkpoint/lineage/resume protocol."""
