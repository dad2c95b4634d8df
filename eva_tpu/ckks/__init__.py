"""CKKS compiler: transforms a source program into an executable HE graph,
selecting encryption parameters and an input signature.

Pass pipeline (order is normative; reference eva/ckks/ckks_compiler.h:36-99):
  TypeDeducer, ConstantFolder, [ReductionCombiner, ReductionLogExpander],
  Rescaler, TypeDeducer, EncodeInserter, TypeDeducer, Relinearizer,
  TypeDeducer, ModSwitcher (the only backward pass), TypeDeducer,
  BackendLowering — then validation (LevelsChecker, ParameterChecker,
  ScalesChecker) and parameter selection."""

from __future__ import annotations

import sys
from typing import Dict, Tuple

from ..logging_util import DEBUG, INFO, log, verbosity_at_least, warn

from ..ir import ENCODE_AT_SCALE, TYPE_ATTR, Program, TermMap, Type
from ..passes import (BSGSRotationFactorizer, ConstantFolder,
                      ReductionCombiner, ReductionLogExpander,
                      RotationKeysSelector, RotationNormalizer, TypeDeducer)
from ..traversal import ProgramTraversal
from .checkers import (InconsistentParameters, LevelsChecker,
                       ParameterChecker, ScalesChecker)
from .config import CKKSConfig
from .encode_insert import EncodeInserter
from .lowering import BackendLowering
from .modswitch import ModSwitcher
from .params import (CKKSEncodingInfo, CKKSParameters, CKKSSignature,
                     EncryptionParametersSelector, max_bits_for_degree,
                     min_degree_for_bit_count)
from .relinearize import EagerRelinearizer, LazyRelinearizer
from .rescalers import RESCALER_CLASSES

__all__ = [
    "CKKSCompiler", "CKKSConfig", "CKKSParameters", "CKKSSignature",
    "CKKSEncodingInfo", "InconsistentParameters",
]


class CKKSCompiler:
    def __init__(self, config: Dict[str, str] = None):
        if isinstance(config, CKKSConfig):
            self.config = config
        else:
            self.config = CKKSConfig(config)

    # -- pipeline -----------------------------------------------------------

    def _transform(self, program: Program, types: TermMap, scales: TermMap) -> None:
        rewrite = ProgramTraversal(program)

        def fwd(p):
            log(DEBUG, "Running %s pass", type(p).__name__)
            rewrite.forward_pass(p)

        fwd(TypeDeducer(program, types))
        fwd(RotationNormalizer(program, types))
        fwd(ConstantFolder(program, scales))
        if self.config.balance_reductions:
            fwd(ReductionCombiner(program))
            if self.config.bsgs_rotations:
                fwd(BSGSRotationFactorizer(program, types, scales))
            fwd(ReductionLogExpander(program, types))
        rescaler_cls = RESCALER_CLASSES[self.config.rescaler]
        fwd(rescaler_cls(program, types, scales))
        fwd(TypeDeducer(program, types))
        fwd(EncodeInserter(program, types, scales))
        fwd(TypeDeducer(program, types))
        if self.config.lazy_relinearize:
            fwd(LazyRelinearizer(program, types, scales))
        else:
            fwd(EagerRelinearizer(program, types, scales))
        fwd(TypeDeducer(program, types))
        log(DEBUG, "Running ModSwitcher pass (backward)")
        rewrite.backward_pass(ModSwitcher(program, types, scales))
        fwd(TypeDeducer(program, types))
        fwd(BackendLowering(program, types))

    def _validate(self, program: Program, types: TermMap, scales: TermMap) -> None:
        traverse = ProgramTraversal(program)
        traverse.forward_pass(LevelsChecker(program, types))
        try:
            traverse.forward_pass(ParameterChecker(program, types))
        except InconsistentParameters:
            if self.config.rescaler == "minimum":
                raise RuntimeError(
                    "The 'minimum' rescaler produced inconsistent parameters. "
                    "Note that this rescaling policy is not general and thus "
                    "will not work for all programs. Please use a different "
                    "rescaler for this program.")
            if self.config.rescaler == "always":
                raise RuntimeError(
                    "The 'always' rescaler produced inconsistent parameters. "
                    "Note that this rescaling policy is not general. It is "
                    "only guaranteed to work for programs that have equal "
                    "scale for all inputs and constants.")
            raise RuntimeError(
                "The current rescaler produced inconsistent parameters. This "
                "is a bug, as this rescaler should be able to handle all "
                "programs.")
        traverse.forward_pass(ScalesChecker(program, scales, types))

    def _determine_parameters(self, program: Program, scales: TermMap,
                              types: TermMap) -> CKKSParameters:
        traverse = ProgramTraversal(program)
        eps = EncryptionParametersSelector(program, scales, types)
        traverse.forward_pass(eps)
        rks = RotationKeysSelector(program, types)
        traverse.forward_pass(rks)

        enc_params = CKKSParameters()
        enc_params.prime_bits = eps.get_encryption_parameters()
        enc_params.rotations = rks.rotation_keys()

        bit_count = sum(enc_params.prime_bits)
        enc_params.poly_modulus_degree = min_degree_for_bit_count(
            self.config.security_level, self.config.quantum_safe, bit_count)

        slots = enc_params.poly_modulus_degree // 2
        if self.config.warn_vec_size and slots > program.vec_size:
            warn(
                "Program specifies vector size %d while at least %d slots are "
                "required for security. This does not affect correctness, as "
                "the smaller vector size will be transparently emulated.",
                program.vec_size, slots)
        if slots < program.vec_size:
            if self.config.shard_vectors:
                # TPU-native big vectors: keep the ring at its security
                # minimum and shard the logical vector across
                # vec_size/slots ciphertexts (crypto/bigvec strided
                # layout). Only the rotation-key steps change: each
                # logical step needs at most two intra-ciphertext Galois
                # steps; scales/levels are untouched (mask-free layout).
                from ..crypto.bigvec import translate_rotation_steps
                k = program.vec_size // slots
                log(INFO,
                    "EVA: vector size %d exceeds the %d slots of N=%d; "
                    "sharding across %d ciphertexts per logical vector",
                    program.vec_size, slots, enc_params.poly_modulus_degree, k)
                enc_params.rotations = translate_rotation_steps(
                    enc_params.rotations, program.vec_size, slots)
            else:
                if self.config.warn_vec_size:
                    warn("Program uses vector size %d while only %d slots "
                         "are required for security.", program.vec_size, slots)
                enc_params.poly_modulus_degree = 2 * program.vec_size

        if self.config.two_entry_ks:
            # TPU-native option: spend SPARE coeff-modulus budget on a
            # second key-switch special-modulus entry (P ~ 2^120), so
            # hybrid digits pack ~2x the sub-primes — half the digit
            # NTT/MAC work per key switch (the dominant op). Applied
            # only when the HE-standard budget at the ALREADY-CHOSEN N
            # has the slack and the chain is deep enough to profit;
            # never changes N, levels, or scales. With the option off
            # the parameter output is byte-identical to the reference.
            key_bits = enc_params.prime_bits[-1]
            budget = max_bits_for_degree(
                self.config.security_level, self.config.quantum_safe,
                enc_params.poly_modulus_degree)
            deep_enough = len(enc_params.prime_bits) >= 4  # >=3 data entries
            if deep_enough and bit_count + key_bits <= budget:
                enc_params.prime_bits.append(key_bits)
                enc_params.key_terms = 2
                bit_count += key_bits
            elif verbosity_at_least(INFO):
                log(INFO,
                    "EVA: two_entry_ks requested but not applied "
                    "(%s); keeping the single key prime",
                    "chain too shallow to profit" if not deep_enough
                    else f"no budget slack at N={enc_params.poly_modulus_degree}")

        if verbosity_at_least(INFO):
            n = enc_params.poly_modulus_degree
            log(INFO,
                "EVA: Encryption parameters for %s are:\n  Q = %s (total bits "
                "%d)\n  N = 2^%d (available slots %d)\n  Rotation keys: %s "
                "(count %d)", program.name, enc_params.prime_bits, bit_count,
                n.bit_length() - 1, n // 2, enc_params.rotations,
                len(enc_params.rotations))
        return enc_params

    def _extract_signature(self, program: Program) -> CKKSSignature:
        from ..ir import ENCODE_AT_LEVEL
        inputs = {}
        for name, term in program.inputs.items():
            type_ = term.get_attr(TYPE_ATTR)
            assert type_ != Type.Undef
            inputs[name] = CKKSEncodingInfo(
                type_, term.get_attr(ENCODE_AT_SCALE), term.get_attr(ENCODE_AT_LEVEL))
        return CKKSSignature(program.vec_size, inputs)

    # -- entry point --------------------------------------------------------

    def compile(self, input_program: Program
                ) -> Tuple[Program, CKKSParameters, CKKSSignature]:
        program = input_program.deep_copy()
        log(INFO, "Compiling %s for CKKS with:\n%s", program.name, self.config)

        types = TermMap(Type.Undef)
        scales = TermMap()
        for source in program.get_sources():
            if not source.has_attr(ENCODE_AT_SCALE):
                for name, term in program.inputs.items():
                    if source is term:
                        raise RuntimeError(f"The scale for input {name} was not set.")
                raise RuntimeError("The scale for a constant was not set.")
            scales[source] = source.get_attr(ENCODE_AT_SCALE)

        self._transform(program, types, scales)
        self._validate(program, types, scales)
        enc_params = self._determine_parameters(program, scales, types)
        signature = self._extract_signature(program)
        return program, enc_params, signature
