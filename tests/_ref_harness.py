"""Shared helpers for running the reference's own PyTorch code.

The reference imports faiss (NCL.py:14) and torchdiffeq
(LightGODE.py:13) at module scope; neither ships in this environment,
which would otherwise exclude those models from every cross-
implementation suite. `install_optional_dep_stubs` provides faithful
CPU stand-ins so the reference's OWN code still runs:

* a numpy Lloyd's ``faiss.Kmeans`` (same API surface NCL.py:66-74
  touches: train / centroids / index.search);
* torchdiffeq's fixed-grid euler ``odeint`` — the grid IS the
  output-times vector, one step per consecutive pair, matching
  torchdiffeq/_impl/fixed_grid.py with no step_size option (the same
  semantics idgrec_tpu.ops.ode reproduces).
"""

from __future__ import annotations

import sys
import types

import numpy as np


def install_optional_dep_stubs() -> None:
    import torch

    try:
        import faiss  # noqa: F401
    except ImportError:
        faiss = types.ModuleType("faiss")

        class Kmeans:
            def __init__(self, d, k, gpu=False, niter=25):
                self.d, self.k, self.niter = int(d), int(k), int(niter)
                self.centroids = None
                self.index = self  # kmeans.index.search(...) in NCL.py:70

            def train(self, x):
                x = np.asarray(x, np.float32)
                c = x[np.random.permutation(x.shape[0])[: self.k]].copy()
                for _ in range(self.niter):
                    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
                    assign = d2.argmin(1)
                    for j in range(self.k):
                        sel = assign == j
                        if sel.any():
                            c[j] = x[sel].mean(0)
                self.centroids = c

            def search(self, x, _k):
                x = np.asarray(x, np.float32)
                d2 = ((x[:, None, :] - self.centroids[None, :, :]) ** 2).sum(-1)
                return d2.min(1)[:, None], d2.argmin(1)[:, None].astype(np.int64)

        faiss.Kmeans = Kmeans
        sys.modules["faiss"] = faiss

    try:
        import torchdiffeq  # noqa: F401
    except ImportError:
        tde = types.ModuleType("torchdiffeq")

        def odeint(func, y0, t, method="euler", options=None):
            assert method == "euler", f"stub only implements euler, got {method}"
            ts = [float(v) for v in t]
            ys, y = [y0], y0
            for t0, t1 in zip(ts[:-1], ts[1:]):
                y = y + (t1 - t0) * func(torch.tensor(t0), y)
                ys.append(y)
            return torch.stack(ys)

        tde.odeint = odeint
        sys.modules["torchdiffeq"] = tde
