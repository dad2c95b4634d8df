"""Compatibility: eva.ckks mirrors the reference submodule."""

from eva_tpu.ckks import (CKKSCompiler, CKKSConfig, CKKSEncodingInfo,
                          CKKSParameters, CKKSSignature)

__all__ = ["CKKSCompiler", "CKKSConfig", "CKKSEncodingInfo",
           "CKKSParameters", "CKKSSignature"]
