"""tpu-quasimap: a TPU-native quasi-mapping framework (RapMap capability rebuild).

Not a port of COMBINE-lab/RapMap's C++ (SURVEY.md): the generalized suffix array,
k-mer -> SA-interval table, and MMP search with NIP skipping are re-designed as
JAX/XLA/Pallas programs over flat HBM-resident arrays, with host-side C++ for the
offline index build and I/O. Semantics are pinned by SEMANTICS.md and the numpy
oracle in rapmap_tpu.oracle.
"""

from rapmap_tpu.version import __version__  # noqa: F401
