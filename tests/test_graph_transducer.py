"""Graph (lattice) transducer loss: values AND gradients must equal the
production RNNT loss on linear transcripts (reference:
asr/parts/k2/graph_transducer.py GraphRnntLoss — k2 lattice RNNT)."""

import jax
import jax.numpy as jnp
import numpy as np

from nemo_tpu.ops.graph_loss import (TransducerGraph, build_dense_batch,
                                     graph_transducer_logp,
                                     graph_transducer_loss,
                                     rnnt_topology_graph)
from nemo_tpu.ops.rnnt import rnnt_loss


def _random_case(seed=0, B=3, T=11, U=4, V=6):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(B, T, U + 1, V + 1), jnp.float32)
    targets = np.asarray(rng.randint(0, V, (B, U)), np.int32)
    f_len = jnp.asarray([T, T - 3, T - 1], jnp.int32)
    t_len = np.asarray([U, U - 1, U - 2], np.int32)
    return logits, targets, f_len, t_len


def test_graph_transducer_matches_rnnt_values():
    logits, targets, f_len, t_len = _random_case()
    lattice = graph_transducer_loss(logits, targets, f_len, t_len)
    ref = rnnt_loss(logits, jnp.asarray(targets), f_len,
                    jnp.asarray(t_len))
    np.testing.assert_allclose(np.asarray(lattice), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_graph_transducer_matches_rnnt_grads():
    logits, targets, f_len, t_len = _random_case(seed=3)

    def lat(lg):
        return jnp.sum(graph_transducer_loss(lg, targets, f_len, t_len))

    def ref(lg):
        return jnp.sum(rnnt_loss(lg, jnp.asarray(targets), f_len,
                                 jnp.asarray(t_len)))

    g1 = np.asarray(jax.grad(lat)(logits))
    g2 = np.asarray(jax.grad(ref)(logits))
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)


def test_graph_transducer_custom_topology_prefers_variant():
    """The lattice accepts NON-linear supervisions: a two-path graph
    (pronunciation variants y=[1,2] OR y=[3]) must score ≥ each single
    variant (it sums their path masses)."""
    rng = np.random.RandomState(7)
    B, T, V = 1, 8, 5
    U1 = 3
    logits = jnp.asarray(rng.randn(B, T, U1, V + 1), jnp.float32)

    # variant graph: 0 -1-> 1 -2-> 2(final), 0 -3-> 2(final)
    frm = np.asarray([0, 1, 0], np.int32)
    to = np.asarray([1, 2, 2], np.int32)
    lab = np.asarray([1, 2, 3], np.int32)
    final = np.asarray([-1e30, -1e30, 0.0], np.float32)
    g = build_dense_batch([(frm, to, lab, np.zeros(3, np.float32),
                            final, 3)])
    tg = TransducerGraph(graph=g,
                         pred_index=jnp.asarray([[0, 1, 2]], jnp.int32))
    f_len = jnp.asarray([T], jnp.int32)
    both = float(graph_transducer_logp(logits, f_len, tg)[0])

    lin12 = -float(graph_transducer_loss(
        logits, np.asarray([[1, 2]], np.int32), f_len,
        np.asarray([2], np.int32))[0])
    assert both >= lin12 - 1e-5
    # and it is a proper logsumexp: strictly above the single path
    assert both > lin12
