"""Serialization / encoding / validation interfaces.

Mirror of ``/root/reference/src/traits/mod.rs``. The reference DECLARES
these traits but implements serialization with serde instead (quirk
SURVEY.md §2.4.11: the ``Encode`` trait has no impls at all); pvw-tpu keeps
the interfaces for API parity and actually wires ``Serialize`` to the PVWT
byte codecs in :mod:`pvw_tpu.utils.serialization`.
"""

from __future__ import annotations

import abc

from .errors import PvwError


class Serialize(abc.ABC):
    """``traits/mod.rs:9-17``."""

    @abc.abstractmethod
    def to_bytes(self) -> bytes: ...

    @classmethod
    @abc.abstractmethod
    def from_bytes(cls, data: bytes) -> "Serialize": ...


class Encode(abc.ABC):
    """``traits/mod.rs:20-28`` — declared-but-unimplemented in the
    reference; kept for parity."""

    @abc.abstractmethod
    def encode(self) -> bytes: ...

    @classmethod
    @abc.abstractmethod
    def decode(cls, data: bytes) -> "Encode": ...


class Validate(abc.ABC):
    """``traits/mod.rs:31-39``."""

    @abc.abstractmethod
    def validate(self) -> None: ...

    def is_valid(self) -> bool:
        try:
            self.validate()
            return True
        except PvwError:
            return False
