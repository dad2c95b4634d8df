"""Compatibility: eva.seal mirrors the reference submodule's surface
(generate_keys and the public/secret/valuation types), backed by the
TPU-native runtime instead of SEAL."""

from eva_tpu.runtime import (EVAPublic as SEALPublic,
                             EVASecret as SEALSecret,
                             EVAValuation as SEALValuation,
                             generate_keys)

__all__ = ["generate_keys", "SEALPublic", "SEALSecret", "SEALValuation"]
