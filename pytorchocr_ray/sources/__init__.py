"""Input-format readers (label files, JSONL) as Ray Data sources."""
