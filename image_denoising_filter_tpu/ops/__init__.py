"""Device kernels: Pallas TPU stencils (tiled layout), XLA variants (linear
layout), and NumPy oracles.

Three interchangeable implementations of each kernel:
  * `stencils.*` -- hand-tiled Pallas kernels with VMEM halo tiles (the
    "tiled optimal texture" analog, the production path);
  * `xla.*` -- whole-image XLA versions (the "linear texel buffer" analog and
    the differentiable/jit fallback);
  * `reference.*` -- NumPy oracles (the test ground truth).
"""

from .fast import (  # noqa: F401
    bilateral_fast,
    cross_bilateral_layers_fast,
    normalize_layers_fast,
)
from .stencils import (  # noqa: F401
    bilateral,
    cross_bilateral_layers,
    nlm_accumulate,
    nlm_accumulate_frames,
    normalize,
)
from .xla import (  # noqa: F401
    bilateral_xla,
    cross_bilateral_layers_xla,
    nlm_xla,
    normalize_xla,
)
