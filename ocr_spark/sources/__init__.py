"""Sources: deterministic transcripts synthesis and table readers."""
