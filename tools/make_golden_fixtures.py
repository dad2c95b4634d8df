"""Regenerate the frozen wire-format fixtures in tests/fixtures/.

Run ONLY when a wire-format change is intentional:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/make_golden_fixtures.py

The fixtures freeze serialized bytes of the two compile-time artifact
sets (program + params + signature) that tests/test_serialization.py's
TestGoldenFixtures compares byte-for-byte against fresh save() output:
a silent serializer drift — term order, attribute codes, field layout,
envelope packing (reference behaviors:
/root/reference/eva/serialization/eva_serialization.cpp:146-289) —
breaks the test instead of passing unnoticed. Compilation is
deterministic (ordered source/sink/orphan sets), so identical sources
compile to identical programs in any process."""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import os

from eva_tpu import EvaProgram, Input, Output
from eva_tpu.ckks import CKKSCompiler
from eva_tpu.serialization import save_to_string

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def readme_poly():
    """The README polynomial (also the reference's examples/poly.py)."""
    poly = EvaProgram("Polynomial", vec_size=1024)
    with poly:
        x = Input("x")
        Output("y", 3 * x ** 2 + 5 * x - 2)
    poly.set_output_ranges(20)
    poly.set_input_scales(30)
    return poly


def rotating():
    """Rotation-bearing program: exercises RotateLeftConst attributes,
    rotation-key selection, and galois steps in CKKSParameters."""
    prog = EvaProgram("Rotating", vec_size=1024)
    with prog:
        x = Input("x")
        y = (x << 1) + (x << 2) * 3 + x ** 2
        Output("y", y + (y << 4))
    prog.set_output_ranges(20)
    prog.set_input_scales(30)
    return prog


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    for build in (readme_poly, rotating):
        prog = build()
        compiled, params, sig = CKKSCompiler(
            {"warn_vec_size": "false"}).compile(prog)
        stem = prog.name.lower()
        for obj, ext in ((compiled, "eva"), (params, "evaparams"),
                         (sig, "evasignature")):
            path = os.path.join(FIXDIR, f"{stem}.{ext}")
            with open(path, "wb") as f:
                f.write(save_to_string(obj))
            print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
