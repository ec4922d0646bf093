from idgrec_tpu.ops.spmm import spmm
from idgrec_tpu.ops import losses, metrics

__all__ = ["spmm", "losses", "metrics"]
