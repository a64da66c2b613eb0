"""Format data tables (context-build time, host NumPy).

TPU equivalent of the reference's L2 table layer (block modes, decimation
grids, partitions, percentiles, BISE/quantization LUTs). Everything here is
generated from the ASTC specification algorithms and validated bit-exactly
against the reference in tests/.
"""

from . import block_mode, bsd, decimation, ise, partition, percentile, quant  # noqa: F401
from .bsd import BlockSizeDescriptor, build_bsd  # noqa: F401
