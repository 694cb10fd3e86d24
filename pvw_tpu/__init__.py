"""pvw-tpu: TPU-native PVW multi-receiver LWE encryption (work in progress)."""
__version__ = "0.1.0"
