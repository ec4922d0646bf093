"""Model zoo. Importing this package registers every model."""

from idgrec_tpu.models import registry
from idgrec_tpu.models.registry import available_models, get_model

# Model modules register themselves on import. Keep this list in sync
# with the reference menu (main.py:28-39) minus DCCF, which the
# reference lists but does not ship (SURVEY.md §2.1).
from idgrec_tpu.models import (  # noqa: F401
    mfbpr,
    lightgcn,
    lightgcn_pp,
    directau,
    mawu,
    sccf,
    lightccf,
    lightcscf,
    egcf,
    simgcl,
    xsimgcl,
    sgl,
    ncl,
    hccf,
    lightgcl,
    cgcl,
    bigcf,
    mixrec,
    ngcf,
    impgcn,
    recdcl,
    cvga,
    lightgode,
)

__all__ = ["registry", "available_models", "get_model"]
