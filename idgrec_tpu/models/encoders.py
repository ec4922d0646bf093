"""Shared encoder switch: MF tables vs LightGCN propagation.

Several reference models select their encoder from config
(``encoder = MF | LightGCN``): DirectAU (models/DirectAU.py:33-37),
MAWU (models/MAWU.py:38-41), SCCF (models/SCCF.py:54-58),
LightCCF (models/LightCCF.py:59-63), LightCSCF (models/LightCSCF.py:58-76).
"""

from __future__ import annotations

from idgrec_tpu.ops.propagate import build_adjacency
from idgrec_tpu.models.base import concat_user_item, lightgcn_propagate, split_user_item


class EncoderSwitchMixin:
    """Adds self.encoder ('MF'|'LightGCN') and `encode(params)`."""

    def _init_encoder(self, config, data):
        self.encoder = config.str("encoder", "MF")
        if self.encoder == "LightGCN":
            self.num_layers = config.int("GCN_layer")
            self.graph = build_adjacency(
                data, "sym", self.backend, compute_dtype=self.compute_dtype,
                emb_size=self.embedding_size,
            )
        elif self.encoder != "MF":
            raise ValueError(f"unknown encoder {self.encoder!r}")

    def encode(self, params):
        """(all_user_emb, all_item_emb) under the configured encoder."""
        if self.encoder == "MF":
            return params["user_emb"], params["item_emb"]
        emb0 = concat_user_item(params)
        final = lightgcn_propagate(self.graph, emb0, self.num_layers)
        return split_user_item(final, self.num_users)
