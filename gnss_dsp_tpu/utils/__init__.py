"""Host-side utilities: sample I/O, CLI parsing, float-float scalar math."""
