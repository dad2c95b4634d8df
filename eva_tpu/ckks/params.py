"""Encryption parameter selection.

EncryptionParametersSelector computes, per term, the list of rescale prime
bit-sizes on the longest rescale path; get_encryption_parameters() builds
the full coeff-modulus bit list: output prime(s) sized range+scale bits,
then rescale primes (reversed), then one key prime.
Reference: eva/ckks/encryption_parameter_selector.h:15-208.

The HE-standard tables give the maximum total log-Q per polynomial degree
and security level (HomomorphicEncryption.org security standard, as
embedded by SEAL v3.6 seal/util/hestdparms.h; reference call site
eva/ckks/ckks_compiler.h:136-199)."""

from __future__ import annotations

from typing import List

from ..ir import RANGE, RESCALE_DIVISOR, Op, Program, Term, TermMap, Type

# Max total coeff-modulus bits per degree: {degree: bits}; 0 beyond table.
HE_STD_PARMS = {
    (128, False): {1024: 27, 2048: 54, 4096: 109, 8192: 218, 16384: 438, 32768: 881},
    (192, False): {1024: 19, 2048: 37, 4096: 75, 8192: 152, 16384: 305, 32768: 611},
    (256, False): {1024: 14, 2048: 29, 4096: 58, 8192: 118, 16384: 237, 32768: 476},
    (128, True): {1024: 25, 2048: 51, 4096: 101, 8192: 202, 16384: 411, 32768: 827},
    (192, True): {1024: 17, 2048: 35, 4096: 70, 8192: 141, 16384: 284, 32768: 571},
    (256, True): {1024: 13, 2048: 27, 4096: 54, 8192: 109, 16384: 220, 32768: 443},
}


def max_bits_for_degree(security_level: int, quantum_safe: bool, degree: int) -> int:
    if security_level <= 128:
        table = HE_STD_PARMS[(128, quantum_safe)]
    elif security_level <= 192:
        table = HE_STD_PARMS[(192, quantum_safe)]
    elif security_level <= 256:
        table = HE_STD_PARMS[(256, quantum_safe)]
    else:
        raise RuntimeError(
            f"EVA has support for up to 256 bit security, but {security_level} "
            "bit security was requested.")
    return table.get(degree, 0)


def min_degree_for_bit_count(security_level: int, quantum_safe: bool, bit_count: int) -> int:
    degree = 1024
    max_bits_seen = 0
    while True:
        max_bits = max_bits_for_degree(security_level, quantum_safe, degree)
        max_bits_seen = max(max_bits_seen, max_bits)
        if max_bits == 0:
            raise RuntimeError(
                f"Program requires a {bit_count} bit modulus, but parameters "
                f"are available for a maximum of {max_bits_seen}")
        if max_bits >= bit_count:
            return degree
        degree *= 2


class CKKSParameters:
    """Abstract encryption parameters chosen by the compiler.

    key_terms: how many trailing prime_bits entries form the key-switch
    special modulus P (1 = reference/SEAL convention; 2 under the
    two_entry_ks compiler option)."""

    def __init__(self, prime_bits=None, rotations=None,
                 poly_modulus_degree=0, key_terms=1):
        self.prime_bits: List[int] = list(prime_bits or [])
        self.rotations: List[int] = sorted(rotations or [])
        self.poly_modulus_degree = poly_modulus_degree
        self.key_terms = key_terms

    def __repr__(self):
        extra = (f", key_terms={self.key_terms}"
                 if self.key_terms != 1 else "")
        return (f"CKKSParameters(prime_bits={self.prime_bits}, "
                f"rotations={self.rotations}, "
                f"poly_modulus_degree={self.poly_modulus_degree}{extra})")

    def __eq__(self, other):
        return (isinstance(other, CKKSParameters)
                and self.prime_bits == other.prime_bits
                and self.rotations == other.rotations
                and self.poly_modulus_degree == other.poly_modulus_degree
                and self.key_terms == getattr(other, "key_terms", 1))


class CKKSEncodingInfo:
    def __init__(self, input_type, scale, level):
        self.input_type = input_type
        self.scale = scale
        self.level = level

    def __repr__(self):
        return (f"CKKSEncodingInfo(type={self.input_type!r}, scale={self.scale}, "
                f"level={self.level})")


class CKKSSignature:
    def __init__(self, vec_size, inputs):
        self.vec_size = vec_size
        self.inputs = inputs  # dict name -> CKKSEncodingInfo

    def __repr__(self):
        return f"CKKSSignature(vec_size={self.vec_size}, inputs={self.inputs})"


class EncryptionParametersSelector:
    def __init__(self, program: Program, scales: TermMap, types: TermMap):
        self.program = program
        self.scales = scales
        self.types = types
        self.terms = TermMap()  # term -> list of rescale prime bit sizes

    def __call__(self, term: Term) -> None:
        if self.types[term] == Type.Raw or term.op == Op.Encode:
            return
        operands = term.operands
        if not operands:
            return
        parms: List[int] = []
        for operand in operands:
            operand_parms = self.terms[operand] or []
            if len(operand_parms) > len(parms):
                parms = list(operand_parms)
        if term.op == Op.Rescale:
            divisor = term.get_attr(RESCALE_DIVISOR)
            assert divisor != 0
            parms = parms + [divisor]
        self.terms[term] = parms

    def get_encryption_parameters(self) -> List[int]:
        parms: List[int] = []
        max_output_size = 0
        max_parm = 0
        max_len = 0
        for output in self.program.outputs.values():
            size = output.get_attr(RANGE) + self.scales.at(output)
            max_output_size = max(max_output_size, size)
            o_parms = self.terms[output] or []
            max_len = max(max_len, len(o_parms))
            for p in o_parms:
                max_parm = max(max_parm, p)

        assert max_output_size != 0
        if max_output_size > 60:
            max_parm = 60
            while max_output_size >= 60:
                parms.append(60)
                max_output_size -= 60
            if max_output_size > 0:
                parms.append(max(20, max_output_size))
        else:
            max_parm = max(max_parm, max_output_size)
            parms.append(max_parm)

        for output in self.program.outputs.values():
            o_parms = self.terms[output] or []
            if len(o_parms) == max_len:
                parms.extend(reversed(o_parms))
                break

        # The "key prime" used only for key-switching.
        parms.append(max_parm)
        return parms
