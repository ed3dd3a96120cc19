"""End-to-end pipeline composition + partitioned resumable runner."""
