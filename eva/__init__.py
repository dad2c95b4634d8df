"""Drop-in compatibility package: `import eva` works like the reference
PyEVA API (python/eva/__init__.py), re-exporting the TPU-native
implementation from eva_tpu."""

from eva_tpu import (EvaProgram, Expr, Input, Op, Output, Program, Term,
                     Type, evaluate, load, py_to_eva, save, set_num_threads,
                     version)
from eva_tpu import __version__

__all__ = [
    "EvaProgram", "Expr", "Input", "Op", "Output", "Program", "Term",
    "Type", "evaluate", "load", "py_to_eva", "save", "set_num_threads",
    "version",
]
