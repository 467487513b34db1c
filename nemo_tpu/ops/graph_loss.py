"""Lattice (graph) training losses: graph-CTC (ML) and MMI (MAP).

Reference parity: `nemo/collections/asr/parts/k2/` — `MLLoss`/`MAPLoss`
(`ml_loss.py`, `map_loss.py`) over k2 FSA lattices: the numerator graph is
the CTC topology composed with the supervision, the denominator a token
LM; training maximizes p(num) (ML = graph CTC) or p(num)/p(den) (MAP =
lattice MMI).

TPU-native design — no k2: graphs are built ONCE on host as dense arc
tensors (the trellis FSTs are tiny: O(U) states for a supervision, O(V)
for a token-LM denominator), and the log-semiring forward runs on-device
as a `lax.scan` over frames with a segment-logsumexp per state —
fully differentiable by JAX autodiff (the occupation probabilities k2
computes by backward pass come for free from `jax.grad`). Per-utterance
graphs batch by arc/state padding + `vmap`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@dataclass
class DenseGraph:
    """Padded batch of epsilon-free acceptors for on-device forward.

    Arcs: from→to emitting ilabel with weight; padded arcs have
    weight = NEG_INF (they never contribute)."""

    n_states: int  # padded state count S
    arc_from: jnp.ndarray  # [B, A] int32
    arc_to: jnp.ndarray  # [B, A] int32
    arc_ilabel: jnp.ndarray  # [B, A] int32
    arc_weight: jnp.ndarray  # [B, A] float32
    final_weight: jnp.ndarray  # [B, S] float32


def ctc_topology_graph(targets: Sequence[int], blank: int) -> Tuple[np.ndarray, ...]:
    """CTC topology ∘ linear supervision: the standard 2U+1-state CTC
    trellis as an explicit FST (k2's ctc_topo ∘ linear_fsa compile).
    States 0..2U: even = blank slots, odd = label u//2. Arcs: self-loops,
    advance-by-one, and the skip between distinct consecutive labels."""
    U = len(targets)
    S = 2 * U + 1
    frm, to, lab = [], [], []
    for s in range(S):
        sym = blank if s % 2 == 0 else int(targets[s // 2])
        frm.append(s); to.append(s); lab.append(sym)  # self-loop
        if s + 1 < S:
            nxt = blank if (s + 1) % 2 == 0 else int(targets[(s + 1) // 2])
            frm.append(s); to.append(s + 1); lab.append(nxt)
        if (s % 2 == 1 and s + 2 < S
                and int(targets[s // 2]) != int(targets[s // 2 + 1])):
            frm.append(s); to.append(s + 2); lab.append(int(targets[s // 2 + 1]))
    final = np.full(S, NEG_INF, np.float32)
    final[S - 1] = 0.0
    if S >= 2:
        final[S - 2] = 0.0  # may end on last label or trailing blank
    return (np.asarray(frm, np.int32), np.asarray(to, np.int32),
            np.asarray(lab, np.int32), np.zeros(len(frm), np.float32),
            final, S)


def token_lm_graph(vocab_size: int, blank: int,
                   log_probs: Optional[np.ndarray] = None) -> Tuple[np.ndarray, ...]:
    """Denominator: a unigram token LM with CTC blank — one state, one
    self-loop per unit (weight = token log-prob; blank weight 0). The
    k2 `ctc_topo ∘ P` denominator at its simplest (P = unigram)."""
    labs = np.arange(vocab_size + 1, dtype=np.int32)
    w = np.zeros(vocab_size + 1, np.float32)
    if log_probs is not None:
        w[:vocab_size] = np.asarray(log_probs, np.float32)
    final = np.zeros(1, np.float32)
    return (np.zeros(vocab_size + 1, np.int32), np.zeros(vocab_size + 1, np.int32),
            labs, w, final, 1)


def build_dense_batch(graphs: Sequence[Tuple[np.ndarray, ...]]) -> DenseGraph:
    """Pad per-utterance graphs to common (S, A) for vmap."""
    S = max(g[5] for g in graphs)
    A = max(len(g[0]) for g in graphs)
    B = len(graphs)
    frm = np.zeros((B, A), np.int32)
    to = np.zeros((B, A), np.int32)
    lab = np.zeros((B, A), np.int32)
    w = np.full((B, A), NEG_INF, np.float32)
    fin = np.full((B, S), NEG_INF, np.float32)
    for b, (f, t, l, wt, fw, s) in enumerate(graphs):
        a = len(f)
        frm[b, :a] = f; to[b, :a] = t; lab[b, :a] = l; w[b, :a] = wt
        fin[b, :s] = fw
    return DenseGraph(S, jnp.asarray(frm), jnp.asarray(to), jnp.asarray(lab),
                      jnp.asarray(w), jnp.asarray(fin))


def graph_forward_logp(log_probs: jnp.ndarray, frame_len: jnp.ndarray,
                       g: DenseGraph) -> jnp.ndarray:
    """Log-semiring forward score log p(lattice) per utterance.

    log_probs [B, T, V] frame log-probs; the scan updates
    α'[to] = logsumexp over arcs (α[from] + lp[t, ilabel] + w), masked by
    frame_len (padded frames leave α unchanged). Autodiff through the
    scan yields arc occupation gradients (k2's backward)."""
    B, T, V = log_probs.shape
    S = g.n_states

    alpha0 = jnp.full((B, S), NEG_INF, jnp.float32).at[:, 0].set(0.0)

    def frame(alpha, t):
        lp_t = log_probs[:, t]  # [B, V]
        arc_lp = jnp.take_along_axis(lp_t, g.arc_ilabel, axis=1)  # [B, A]
        src = jnp.take_along_axis(alpha, g.arc_from, axis=1)
        score = src + arc_lp + g.arc_weight  # [B, A]
        # segment-logsumexp into destination states, stabilized by a
        # per-destination scatter-max
        neg = jnp.full((B, S), NEG_INF, jnp.float32)
        dest_max = neg.at[jnp.arange(B)[:, None], g.arc_to].max(score)
        gmax = jnp.take_along_axis(dest_max, g.arc_to, axis=1)
        ex = jnp.where(score > NEG_INF / 2, jnp.exp(score - gmax), 0.0)
        sums = jnp.zeros((B, S), jnp.float32).at[
            jnp.arange(B)[:, None], g.arc_to].add(ex)
        new_alpha = jnp.where(sums > 0, jnp.log(sums) + dest_max, NEG_INF)
        alive = (t < frame_len)[:, None]
        return jnp.where(alive, new_alpha, alpha), None

    alpha, _ = jax.lax.scan(frame, alpha0, jnp.arange(T))
    return jax.scipy.special.logsumexp(alpha + g.final_weight, axis=1)


def graph_ctc_loss(log_probs: jnp.ndarray, frame_len: jnp.ndarray,
                   targets: np.ndarray, target_len: np.ndarray,
                   blank: int) -> jnp.ndarray:
    """ML graph loss [B]: −log p(num). With the standard CTC topology this
    EQUALS CTC loss (parity-tested vs ops/ctc.py) — the point is the same
    machinery accepts ARBITRARY numerator graphs (lexicons, boosted
    phrases, pronunciation variants)."""
    graphs = [ctc_topology_graph(
        [int(x) for x in np.asarray(targets[b])[: int(target_len[b])]], blank)
        for b in range(log_probs.shape[0])]
    g = build_dense_batch(graphs)
    return -graph_forward_logp(log_probs, frame_len, g)


def mmi_loss(log_probs: jnp.ndarray, frame_len: jnp.ndarray,
             targets: np.ndarray, target_len: np.ndarray, blank: int,
             den_unigram: Optional[np.ndarray] = None,
             den_scale: float = 1.0) -> jnp.ndarray:
    """MAP/MMI lattice loss [B]: −(log p(num) − den_scale·log p(den))
    (reference map_loss.py MMI). Denominator = CTC-blank unigram token LM
    (pass `den_unigram` log-probs to weight it). Always ≥ 0 when the
    numerator paths are a subset of the denominator's (they are)."""
    B, T, V = log_probs.shape
    num = -graph_ctc_loss(log_probs, frame_len, targets, target_len, blank)
    den_g = build_dense_batch(
        [token_lm_graph(V - 1, blank, den_unigram)] * B)
    den = graph_forward_logp(log_probs, frame_len, den_g)
    return -(num - den_scale * den)


# --------------------------------------------------------------------------
# Graph transducer (lattice RNNT)
# --------------------------------------------------------------------------


@dataclass
class TransducerGraph:
    """Supervision acceptor for lattice RNNT: DenseGraph arcs plus a
    per-state predictor row `pred_index` (which joint row u scores arcs
    leaving that state — for a linear transcript, state u ↔ u emitted
    labels)."""

    graph: DenseGraph
    pred_index: jnp.ndarray  # [B, S] int32


def rnnt_topology_graph(targets: Sequence[int]) -> Tuple[np.ndarray, ...]:
    """Linear RNNT supervision: U+1 states, arc u --y_u--> u+1 (weight 0),
    final at state U (blank time-advances are implicit in the forward).
    The k2 GraphRnntLoss 'minimal' topology for a linear transcript
    (reference asr/parts/k2/graph_transducer.py GraphRnntLoss)."""
    U = len(targets)
    S = U + 1
    frm = np.arange(U, dtype=np.int32)
    to = frm + 1
    lab = np.asarray([int(t) for t in targets], np.int32)
    final = np.full(S, NEG_INF, np.float32)
    final[U] = 0.0
    return (frm, to, lab, np.zeros(U, np.float32), final, S)


def graph_transducer_logp(logits: jnp.ndarray, f_len: jnp.ndarray,
                          tg: TransducerGraph,
                          blank_last: bool = True) -> jnp.ndarray:
    """Lattice RNNT log-likelihood [B] over joint logits [B, T, U1, V+1].

    Per frame: (a) label closure — relax the supervision graph's label
    arcs S−1 times (a transducer may emit any number of labels per frame;
    for an acyclic supervision S−1 relaxations reach the fixpoint), each
    arc scored by lp[t, pred_index[from], ilabel]; then (b) the blank
    time-advance adds lp[t, pred_index[s], blank] to every state. The
    path ends with the last valid frame's blank (standard transducer
    semantics), so the total is lse(alpha + final_weight) after the scan.
    With `rnnt_topology_graph` this EQUALS `ops.rnnt.rnnt_loss` in values
    and gradients (parity-tested) — and the same machinery accepts
    arbitrary supervision graphs (pronunciation variants, boosted
    phrases) like the reference's k2 GraphRnntLoss. O(T·S·A) — a tools/
    research path, not the production chunked loss."""
    g = tg.graph
    B, T, U1, V1 = logits.shape
    S = g.n_states
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank = V1 - 1 if blank_last else 0
    rows = jnp.arange(B)[:, None]
    pu_from = jnp.take_along_axis(tg.pred_index, g.arc_from, axis=1)  # [B,A]
    flat_idx = pu_from * V1 + g.arc_ilabel  # [B, A] into [U1*V1]

    def seg_lse_into(score, base):
        """logaddexp(base, segment-lse of score by arc_to) — stabilized."""
        both_max = base.at[rows, g.arc_to].max(score)
        gmax = jnp.maximum(both_max, NEG_INF / 2)
        ex_base = jnp.where(base > NEG_INF / 2,
                            jnp.exp(base - gmax), 0.0)
        sc_max = jnp.take_along_axis(gmax, g.arc_to, axis=1)
        ex_arc = jnp.where(score > NEG_INF / 2,
                           jnp.exp(score - sc_max), 0.0)
        sums = ex_base.at[rows, g.arc_to].add(ex_arc)
        return jnp.where(sums > 0, jnp.log(sums) + gmax, NEG_INF)

    neg = jnp.full((B, S), NEG_INF, jnp.float32)

    def frame(alpha, t):
        lp_t = lp[:, t].reshape(B, U1 * V1)  # [B, U1·V1]
        arc_lp = jnp.take_along_axis(lp_t, flat_idx, axis=1)  # [B, A]

        # frontier closure: each iteration extends ONLY the newest mass by
        # one label arc (re-relaxing the accumulated total would count a
        # k-label path once per remaining iteration — double counting)
        def relax(_, carry):
            total, frontier = carry
            src = jnp.take_along_axis(frontier, g.arc_from, axis=1)
            moved = seg_lse_into(src + arc_lp + g.arc_weight, neg)
            return jnp.logaddexp(total, moved), moved

        closed, _ = jax.lax.fori_loop(
            0, max(S - 1, 1), relax, (alpha, alpha))
        pb = jnp.take_along_axis(
            lp[:, t, :, blank], tg.pred_index, axis=1)  # [B, S]
        advanced = closed + pb
        alive = (t < f_len)[:, None]
        return jnp.where(alive, advanced, alpha), None

    alpha0 = jnp.full((B, S), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    alpha, _ = jax.lax.scan(frame, alpha0, jnp.arange(T))
    return jax.scipy.special.logsumexp(alpha + g.final_weight, axis=1)


def graph_transducer_loss(logits: jnp.ndarray, targets: np.ndarray,
                          f_len: jnp.ndarray, t_len: np.ndarray
                          ) -> jnp.ndarray:
    """NLL [B] for linear transcripts through the lattice machinery
    (reference GraphRnntLoss forward; == ops.rnnt.rnnt_loss)."""
    B = logits.shape[0]
    graphs = [rnnt_topology_graph(
        [int(x) for x in np.asarray(targets[b])[: int(t_len[b])]])
        for b in range(B)]
    g = build_dense_batch(graphs)
    S = g.n_states
    pred = np.zeros((B, S), np.int32)
    for b in range(B):
        U = int(t_len[b])
        pred[b, : U + 1] = np.arange(U + 1)
        pred[b, U + 1:] = U  # padded states score the last row (unused)
    tg = TransducerGraph(graph=g, pred_index=jnp.asarray(pred))
    return -graph_transducer_logp(logits, f_len, tg)
