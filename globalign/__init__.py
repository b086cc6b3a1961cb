"""Drop-in compatibility package for ``globalign`` users.

``import globalign`` (or any of its submodules ``globalign.globaligner``,
``globalign.start``, ``globalign.conclude``) resolves to thin shims over the
TPU-native engine in :mod:`globalign_tpu`, with the reference package's
module layout, function names, signatures, and nested-dict matrix formats
(reference: src/globalign/{globaligner,start,conclude}.py).  Scores and
costs are bit-identical to the reference; alignments are deterministic
where the reference tie-broke at random.

Not shimmed: the reference's internal DP helpers (``get_next_best_costs``,
``dp_array_forward``/``backward``, ``make_dp_array``, the four ``take_*``
move functions, ``cost_ranks_dispatcher``) — they are implementation
details of its interpreted fill with no meaning for the TPU engine.
"""

from . import conclude, globaligner, start  # noqa: F401
from .globaligner import find_global_alignment  # noqa: F401
