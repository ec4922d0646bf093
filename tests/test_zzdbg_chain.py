import numpy as np, jax, jax.numpy as jnp

def test_dbg(tiny_dataset, rng):
    from idgrec_tpu.ops import chainmm, propagate as prop
    from idgrec_tpu.ops.propagate import build_adjacency
    adj = build_adjacency(tiny_dataset, "sym", "fused", compute_dtype="int8", emb_size=8)
    x = jnp.asarray(rng.normal(size=(tiny_dataset.num_nodes, 8)).astype(np.float32))
    h1 = np.asarray(prop.fused_chain_t(adj, x, 1, False, "sum"))
    man = np.asarray(x) + h1
    got = np.asarray(chainmm.fused_chain_resident(adj, x, 1, True, "sum"))
    print("got vs numpy-add nbad", int((got != man).sum()))
    got_nol0 = np.asarray(chainmm.fused_chain_resident(adj, x, 1, False, "sum"))
    print("resident h1 vs chain_t h1 nbad", int((got_nol0 != h1).sum()))
    print("resident(il0) - x == resident h1?", int((np.asarray(got) - np.asarray(x) != got_nol0).sum()))
    assert False
