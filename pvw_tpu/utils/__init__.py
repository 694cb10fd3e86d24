"""Host utilities: exact integer math, ChaCha8/SipHash, serialization."""
