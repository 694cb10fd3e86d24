"""Key management (mirrors ``/root/reference/src/keys/mod.rs``)."""
from .secret_key import SecretKey
from .public_key import Party, PublicKey, GlobalPublicKey

__all__ = ["SecretKey", "Party", "PublicKey", "GlobalPublicKey"]
