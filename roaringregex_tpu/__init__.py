"""roaringregex_tpu -- a TPU-native regex / string-scanning framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
RoaringRegex reference engine (POSIX-ERE, Thompson/Glushkov NFA simulation
with tiered state-set representations), re-architected for TPUs:

* host compiler: POSIX-ERE -> epsilon-free Glushkov position NFA whose
  transition factorizes as ``delta(D, c) = follow(D) & B[c]``;
* device scan: the per-byte step runs as batched MXU matmuls / Pallas
  kernels over VMEM-resident tables -- dense 128- and 256-state tiers plus a
  block-sparse follow-matrix tier for pathological automata (``a{1,300}``);
* distributed: corpora shard data-parallel over a device mesh, tables are
  replicated, match statistics reduce with psum over ICI.

See SURVEY.md for the structural analysis of the reference and BASELINE.md
for performance targets.
"""

from .api import Match, MultiPattern, Pattern, compile  # noqa: F401
from .compiler.nfa import NFA, build_nfa  # noqa: F401
from .compiler.program import DeviceProgram, compile_program  # noqa: F401
from .compiler.parser import RegexSyntaxError, parse  # noqa: F401
from .compiler.serialize import (  # noqa: F401
    cached_compile,
    load_program,
    save_program,
)
from .oracle.engine import OracleEngine  # noqa: F401

__version__ = "0.1.0"
