"""Batched n-gram language model for on-device shallow fusion.

Reference parity: `nemo/collections/asr/parts/submodules/ngram_lm/`
(NGramGPULanguageModel: KenLM/ARPA n-gram LM resident on the accelerator,
queried in batch from beam decoders) and the beam-search LM fusion in
`rnnt_beam_decoding.py` / `ctc_beam_decoding.py`.

TPU-native design (no trie-pointer chasing):
- The LM is built host-side (ARPA parse or absolute-discount estimation)
  into ONE open-addressing hash table held as flat device arrays
  (slot fingerprints + float values). Keys are FNV-1a 32-bit hashes of
  (level, context…, token); a second independent hash is the stored
  fingerprint, and the build verifies zero fingerprint aliasing inside any
  probe window (rebuilds with a new seed otherwise), so device lookups are
  exact — no probabilistic filtering.
- Querying is a fixed-depth gather pipeline: for each backoff level the
  context-prefix hash is extended to all V continuations at once, so
  `score_all` ([M] states → [M, V] log-probs) is a handful of vectorized
  gathers — no data-dependent control flow, scan/beam friendly.
- LM state is just the token context window [*, order-1] (right-aligned,
  -1 padded): `advance` is a roll+set. ARPA backoff semantics are exact:
  missing context ⇒ backoff weight ln(1)=0; probabilities are found at the
  longest matching level.
"""

from __future__ import annotations

import math
from collections import defaultdict
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FNV_PRIME = np.uint32(0x01000193)
_LN10 = math.log(10.0)
_MISS = -1e30  # fingerprint for empty slots (stored as int32 sentinel)
_EMPTY = np.int32(-2147483648)


def _fnv(seed: np.uint32, ids: Sequence[int]) -> np.uint32:
    h = np.uint32(seed)
    for i in ids:
        h = np.uint32((int(h) ^ (int(i) & 0xFFFFFFFF)) * int(_FNV_PRIME) & 0xFFFFFFFF)
    return h


class NGramLM:
    """Immutable n-gram LM; device arrays + host build/parse utilities."""

    def __init__(self, order: int, vocab_size: int,
                 slots_fp: np.ndarray, slots_lp: np.ndarray,
                 slots_bo: np.ndarray, n_probes: int, seeds: Tuple[int, int],
                 unk_logp: float, bos_id: Optional[int] = None):
        self.order = order
        self.vocab_size = vocab_size
        self.n_probes = n_probes
        self.seeds = seeds
        self.unk_logp = float(unk_logp)
        self.bos_id = bos_id
        self.mask = len(slots_fp) - 1
        self.slots_fp = jnp.asarray(slots_fp)  # int32 fingerprints
        self.slots_lp = jnp.asarray(slots_lp)  # float32 ln P
        self.slots_bo = jnp.asarray(slots_bo)  # float32 ln backoff

    # ------------------------------------------------------------------
    # host build
    # ------------------------------------------------------------------

    @staticmethod
    def _build_table(entries: Dict[Tuple[int, ...], Tuple[float, float]],
                     order: int, vocab_size: int, unk_logp: float,
                     bos_id: Optional[int]) -> "NGramLM":
        """entries: key = (level, id1..idn) → (ln p, ln backoff)."""
        n = max(len(entries), 1)
        size = 1
        while size < 4 * n:
            size *= 2
        for attempt in range(8):
            s1, s2 = np.uint32(0x811C9DC5 + 97 * attempt), np.uint32(0x9747B28C + 131 * attempt)
            fp = np.full(size, _EMPTY, np.int32)
            lp = np.zeros(size, np.float32)
            bo = np.zeros(size, np.float32)
            maxd, ok = 0, True
            for key, (l, b) in entries.items():
                h1 = int(_fnv(s1, key)) & (size - 1)
                f = np.int32(np.uint32(_fnv(s2, key)) & 0x7FFFFFFF)
                d = 0
                while True:
                    slot = (h1 + d) & (size - 1)
                    if fp[slot] == _EMPTY:
                        fp[slot], lp[slot], bo[slot] = f, l, b
                        break
                    if fp[slot] == f:
                        ok = False  # fingerprint alias within probe chain
                        break
                    d += 1
                maxd = max(maxd, d)
                if not ok:
                    break
            if ok:
                # verify no aliasing: any probe window for an inserted key must
                # not contain another entry with the same fingerprint earlier
                return NGramLM(order, vocab_size, fp, lp, bo, maxd + 1,
                               (int(s1), int(s2)), unk_logp, bos_id)
        raise RuntimeError("could not build alias-free LM hash table")

    @classmethod
    def fit(cls, seqs: Sequence[Sequence[int]], order: int, vocab_size: int,
            discount: float = 0.4, use_bos: bool = True) -> "NGramLM":
        """Absolute-discount backoff estimation from token sequences.

        p(w|c) = (count(c,w) − D)/count(c),  backoff(c) = D·N1+(c)/count(c),
        recursing to a floor-smoothed unigram — proper ARPA-style normalized
        tables (reference builds these offline with KenLM; here self-contained
        so context-biasing / fusion tests need no external artifacts).
        """
        bos_id = vocab_size if use_bos else None
        counts = [defaultdict(int) for _ in range(order + 1)]
        for seq in seqs:
            s = ([bos_id] if use_bos else []) + [int(t) for t in seq]
            start = 1 if use_bos else 0
            for i in range(start, len(s)):
                for n in range(1, order + 1):
                    if i - n + 1 < 0:
                        break
                    counts[n][tuple(s[i - n + 1:i + 1])] += 1
        total = sum(counts[1].values()) or 1
        entries: Dict[Tuple[int, ...], Tuple[float, float]] = {}
        # unigrams: floor-smoothed over the full vocab
        floor = 0.5
        denom = total + floor * (vocab_size + (1 if use_bos else 0))
        unk_logp = math.log(floor / denom)
        for w in range(vocab_size):
            c = counts[1].get((w,), 0)
            entries[(1, w)] = (math.log((c + floor) / denom), 0.0)
        if use_bos:
            entries[(1, bos_id)] = (unk_logp, 0.0)
        # higher orders with absolute discounting
        for n in range(2, order + 1):
            ctx_tot = defaultdict(int)
            ctx_n1 = defaultdict(int)
            for key, c in counts[n].items():
                ctx_tot[key[:-1]] += c
                ctx_n1[key[:-1]] += 1
            for key, c in counts[n].items():
                p = max(c - discount, 1e-9) / ctx_tot[key[:-1]]
                entries[(n,) + key] = (math.log(p), 0.0)
            # backoff weights live on the (n−1)-gram CONTEXT entries
            for ctx, tot in ctx_tot.items():
                bow = discount * ctx_n1[ctx] / tot
                k = (n - 1,) + ctx
                l = entries.get(k, (unk_logp, 0.0))[0]
                entries[k] = (l, math.log(max(bow, 1e-9)))
        return cls._build_table(entries, order, vocab_size, unk_logp, bos_id)

    @classmethod
    def from_arpa(cls, path: str, vocab: Dict[str, int],
                  vocab_size: Optional[int] = None) -> "NGramLM":
        """Parse an ARPA file (KenLM output format). `vocab` maps LM words to
        token ids; `<s>`/`</s>`/`<unk>` handled specially. log10 → ln."""
        vocab = dict(vocab)
        vsize = vocab_size or (max(vocab.values()) + 1)
        bos_id = vocab.setdefault("<s>", vsize)
        vocab.setdefault("</s>", vsize + 1)
        entries: Dict[Tuple[int, ...], Tuple[float, float]] = {}
        unk_logp = math.log(1e-10)
        order, cur = 0, 0
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("\\data"):
                    continue
                if line.startswith("ngram "):
                    order = max(order, int(line.split()[1].split("=")[0]))
                    continue
                if line.startswith("\\") and "-grams:" in line:
                    cur = int(line[1:].split("-")[0])
                    continue
                if line.startswith("\\end"):
                    break
                parts = line.split("\t")
                if len(parts) < 2 or cur == 0:
                    continue
                lp = float(parts[0]) * _LN10
                words = parts[1].split()
                bo = float(parts[2]) * _LN10 if len(parts) > 2 else 0.0
                if any(w not in vocab for w in words):
                    if words == ["<unk>"]:
                        unk_logp = lp
                    continue
                ids = tuple(vocab[w] for w in words)
                key = (cur,) + ids
                old = entries.get(key)
                entries[key] = (lp, bo if bo != 0.0 else (old[1] if old else 0.0))
        return cls._build_table(entries, order, vsize, unk_logp, bos_id)

    # ------------------------------------------------------------------
    # device queries (pure jax; usable inside jit/scan/while)
    # ------------------------------------------------------------------

    def _hash_seq_dev(self, seed: int, cols: List[jnp.ndarray]) -> jnp.ndarray:
        h = jnp.full(cols[0].shape, np.uint32(seed), jnp.uint32)
        for c in cols:
            h = (h ^ c.astype(jnp.uint32)) * _FNV_PRIME
        return h

    def _lookup(self, h1: jnp.ndarray, f: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """h1/f uint32 […] → (found, ln p, ln backoff)."""
        f = (f & np.uint32(0x7FFFFFFF)).astype(jnp.int32)
        base = (h1 & np.uint32(self.mask)).astype(jnp.int32)
        slots = (base[..., None] + jnp.arange(self.n_probes, dtype=jnp.int32)) & self.mask
        fps = self.slots_fp[slots]  # [..., P]
        match = fps == f[..., None]
        found = jnp.any(match, axis=-1)
        idx = jnp.argmax(match, axis=-1)
        slot = jnp.take_along_axis(slots, idx[..., None], axis=-1)[..., 0]
        return found, self.slots_lp[slot], self.slots_bo[slot]

    def init_state(self, batch_shape: Tuple[int, ...]) -> jnp.ndarray:
        """Context window [*, order-1], -1 padded; BOS seeded if trained so."""
        ctx = jnp.full(batch_shape + (max(self.order - 1, 1),), -1, jnp.int32)
        if self.bos_id is not None and self.order > 1:
            ctx = ctx.at[..., -1].set(self.bos_id)
        return ctx

    def advance(self, ctx: jnp.ndarray, token: jnp.ndarray) -> jnp.ndarray:
        """Shift the context window by one emitted token."""
        if self.order == 1:
            return ctx
        return jnp.concatenate([ctx[..., 1:], token[..., None]], axis=-1)

    def score_all(self, ctx: jnp.ndarray) -> jnp.ndarray:
        """[*, order-1] context → [*, V] ln p(v | context), exact ARPA backoff.

        One prefix hash per level, extended to all V continuations by a single
        vectorized FNV step — O(order) gathers total.
        """
        s1, s2 = self.seeds
        V = self.vocab_size
        v = jnp.arange(V, dtype=jnp.uint32)
        C = ctx.shape[-1]
        # level n uses (n-1) context tokens: suffix ctx[..., C-(n-1):]
        lp_acc = jnp.full(ctx.shape[:-1] + (V,), self.unk_logp, jnp.float32)
        found_any = jnp.zeros(ctx.shape[:-1] + (V,), bool)
        bo_acc = jnp.zeros(ctx.shape[:-1], jnp.float32)  # accumulated backoff
        out = jnp.full(ctx.shape[:-1] + (V,), self.unk_logp, jnp.float32)
        done = jnp.zeros(ctx.shape[:-1] + (V,), bool)
        for n in range(self.order, 0, -1):
            k = n - 1  # context length
            cols = [jnp.full(ctx.shape[:-1], np.uint32(n), jnp.uint32)]
            ctx_cols = [ctx[..., C - k + j] for j in range(k)] if k else []
            valid_ctx = jnp.ones(ctx.shape[:-1], bool)
            for c in ctx_cols:
                valid_ctx &= c >= 0
            h1p = self._hash_seq_dev(s1, cols + ctx_cols)
            h2p = self._hash_seq_dev(s2, cols + ctx_cols)
            # extend prefix hash to every continuation token v
            h1 = (h1p[..., None] ^ v) * _FNV_PRIME
            h2 = (h2p[..., None] ^ v) * _FNV_PRIME
            found, lp, _ = self._lookup(h1, h2)
            found &= valid_ctx[..., None]
            take = found & ~done
            out = jnp.where(take, lp + bo_acc[..., None], out)
            done |= found
            # backoff weight of the context itself (an (n-1)-gram entry)
            if k >= 1:
                hb1 = self._hash_seq_dev(s1, [jnp.full(ctx.shape[:-1], np.uint32(k), jnp.uint32)] + ctx_cols)
                hb2 = self._hash_seq_dev(s2, [jnp.full(ctx.shape[:-1], np.uint32(k), jnp.uint32)] + ctx_cols)
                bfound, _, bbo = self._lookup(hb1, hb2)
                bo_acc = bo_acc + jnp.where(bfound & valid_ctx, bbo, 0.0)
        # states where even the unigram missed keep unk + accumulated backoff
        out = jnp.where(done, out, self.unk_logp + bo_acc[..., None])
        return out

    def score(self, ctx: jnp.ndarray, token: jnp.ndarray) -> jnp.ndarray:
        """[*, order-1], [*] int32 → [*] ln p(token | ctx)."""
        all_lp = self.score_all(ctx)
        return jnp.take_along_axis(all_lp, token[..., None].astype(jnp.int32), -1)[..., 0]

    # ------------------------------------------------------------------
    # host adapters
    # ------------------------------------------------------------------

    def host_lm(self):
        """Callable(prefix_tuple, token) → ln p for the host CTC prefix beam
        (`parts/ctc_beam.py` lm= hook)."""
        C = max(self.order - 1, 1)

        def fn(prefix, token):
            ids = list(prefix)[-C:] if C else []
            pad = [-1] * (C - len(ids))
            if self.bos_id is not None and len(ids) < C and len(prefix) == len(ids):
                pad = [-1] * (C - len(ids) - 1) + [self.bos_id]
            ctx = jnp.asarray(np.array([pad + ids], np.int32))
            return float(self.score(ctx, jnp.asarray([token], jnp.int32))[0])

        return fn

    def logp_sequence(self, ids: Sequence[int]) -> float:
        """Σ ln p over a sequence (device math, host convenience)."""
        ctx = self.init_state(())
        total = 0.0
        for t in ids:
            total += float(self.score(ctx[None], jnp.asarray([int(t)]))[0])
            ctx = self.advance(ctx, jnp.asarray(int(t)))
        return total
