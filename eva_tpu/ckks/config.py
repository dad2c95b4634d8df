"""CKKS compiler configuration. Reference: eva/ckks/ckks_config.h/.cpp."""

from __future__ import annotations

import sys
from typing import Dict

OPTIONS_HELP_MESSAGE = (
    "balance_reductions - Balance trees of mul, add or sub operations. bool (default=true)\n"
    "rescaler           - Rescaling policy. One of: lazy_waterline (default), eager_waterline, always, minimum\n"
    "lazy_relinearize   - Relinearize as late as possible. bool (default=true)\n"
    "security_level     - How many bits of security parameters should be selected for. int (default=128)\n"
    "quantum_safe       - Select quantum safe parameters. bool (default=false)\n"
    "warn_vec_size      - Warn about possibly inefficient vector size selection. bool (default=true)\n"
    "shard_vectors      - Shard vectors larger than the slot count across a ciphertext batch\n"
    "                     instead of growing the ring (TPU-native extension). bool (default=true)\n"
    "bsgs_rotations     - Factor rotation-heavy sums baby-step/giant-step, cutting key switches\n"
    "                     and rotation keys ~2x for convolutions (TPU-native extension; requires\n"
    "                     balance_reductions). bool (default=true)\n"
    "two_entry_ks       - Spend spare coeff-modulus budget on a SECOND key-switch special\n"
    "                     modulus entry (P ~ 2^120), halving hybrid key-switch digit count on\n"
    "                     deep chains (TPU-native extension; only applied when the HE-standard\n"
    "                     budget has the slack — never changes N). bool (default=false)"
)

RESCALERS = ("lazy_waterline", "eager_waterline", "always", "minimum")


def _parse_bool(key: str, value: str) -> bool:
    low = value.strip().lower()
    if low in ("true", "1", "yes", "on"):
        return True
    if low in ("false", "0", "no", "off"):
        return False
    raise ValueError(f"Could not parse boolean option {key}={value}")


class CKKSConfig:
    def __init__(self, config: Dict[str, str] = None):
        self.balance_reductions = True
        self.rescaler = "lazy_waterline"
        self.lazy_relinearize = True
        self.security_level = 128
        self.quantum_safe = False
        self.warn_vec_size = True
        self.shard_vectors = True
        self.bsgs_rotations = True
        self.two_entry_ks = False
        if config:
            for key, value in config.items():
                if key == "balance_reductions":
                    self.balance_reductions = _parse_bool(key, value)
                elif key == "rescaler":
                    if value not in RESCALERS:
                        raise ValueError(
                            f"Unknown rescaler '{value}'. Must be one of {RESCALERS}")
                    self.rescaler = value
                elif key == "lazy_relinearize":
                    self.lazy_relinearize = _parse_bool(key, value)
                elif key == "security_level":
                    self.security_level = int(value)
                elif key == "quantum_safe":
                    self.quantum_safe = _parse_bool(key, value)
                elif key == "warn_vec_size":
                    self.warn_vec_size = _parse_bool(key, value)
                elif key == "shard_vectors":
                    self.shard_vectors = _parse_bool(key, value)
                elif key == "bsgs_rotations":
                    self.bsgs_rotations = _parse_bool(key, value)
                elif key == "two_entry_ks":
                    self.two_entry_ks = _parse_bool(key, value)
                else:
                    print(
                        f"WARNING: Unknown option {key}. Available options are:\n"
                        + OPTIONS_HELP_MESSAGE, file=sys.stderr)

    def __str__(self) -> str:
        return (
            f"balance_reductions = {str(self.balance_reductions).lower()}\n"
            f"rescaler = {self.rescaler}\n"
            f"lazy_relinearize = {str(self.lazy_relinearize).lower()}\n"
            f"security_level = {self.security_level}\n"
            f"quantum_safe = {str(self.quantum_safe).lower()}\n"
            f"warn_vec_size = {str(self.warn_vec_size).lower()}\n"
            f"bsgs_rotations = {str(self.bsgs_rotations).lower()}\n"
            f"shard_vectors = {str(self.shard_vectors).lower()}\n"
            f"two_entry_ks = {str(self.two_entry_ks).lower()}")
