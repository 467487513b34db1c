"""VLM data pipeline: CLIP image preprocessing, LLaVA conversation
templating, preloaded (JSON-manifest) and mock data modules.

Reference parity: `nemo/collections/vlm/neva/data/` — multimodal_tokens.py
(`<image>` placeholder, IMAGE_TOKEN_INDEX, IGNORE_INDEX), preloaded.py
(LLaVA json manifest → conversation prompt → tokens with image tokens
spliced, labels masked to assistant turns, expand2square + CLIP processor),
mock.py (random batches at the model's shapes). TPU-first: the collator
emits STATIC shapes — tokens padded to seq_length with exactly
`num_image_tokens` placeholders per row, images as one [B, H, W, C] f32
array — so the whole train step jits once.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

# reference multimodal_tokens.py conventions
IMAGE_TOKEN_STR = "<image>"
IGNORE_INDEX = -100

# OpenAI CLIP normalization (reference: HF CLIPImageProcessor defaults,
# used by vlm/neva preloaded datasets)
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass
class CLIPImageProcessor:
    """Resize(shortest edge, bicubic) → center crop → rescale → normalize
    (the HF CLIPImageProcessor pipeline NeVA/CLIP checkpoints assume)."""

    size: int = 336
    crop_size: Optional[int] = None  # None → size
    mean: Sequence[float] = OPENAI_CLIP_MEAN
    std: Sequence[float] = OPENAI_CLIP_STD
    pad_to_square: bool = False  # LLaVA 'pad' image_aspect_ratio

    def __call__(self, image) -> np.ndarray:
        """PIL image / [H,W,C] uint8 array → [S,S,3] float32 normalized."""
        from PIL import Image

        if isinstance(image, np.ndarray):
            image = Image.fromarray(image.astype(np.uint8))
        image = image.convert("RGB")
        if self.pad_to_square:
            # reference preloaded.py expand2square: pad with the mean color
            bg = tuple(int(x * 255) for x in self.mean)
            w, h = image.size
            if w != h:
                side = max(w, h)
                canvas = Image.new("RGB", (side, side), bg)
                canvas.paste(image, ((side - w) // 2, (side - h) // 2))
                image = canvas
        crop = self.crop_size or self.size
        w, h = image.size
        scale = self.size / min(w, h)
        image = image.resize((max(crop, round(w * scale)),
                              max(crop, round(h * scale))),
                             Image.BICUBIC)
        w, h = image.size
        left, top = (w - crop) // 2, (h - crop) // 2
        image = image.crop((left, top, left + crop, top + crop))
        x = np.asarray(image, np.float32) / 255.0
        return (x - np.asarray(self.mean, np.float32)) / np.asarray(
            self.std, np.float32)


def llava_conversation_prompt(conversations: List[Dict[str, str]],
                              system: str = (
                                  "A chat between a curious human and an "
                                  "artificial intelligence assistant.")):
    """LLaVA v1 template (reference data/conversation.py conv_vicuna_v1):
    returns (full_prompt, assistant_spans) where spans are (start, end)
    character ranges of assistant replies — the only supervised text."""
    parts = [system]
    spans = []
    pos = len(system)
    for turn in conversations:
        role = "USER" if turn["from"] in ("human", "user") else "ASSISTANT"
        seg = f" {role}: {turn['value']}"
        if role == "ASSISTANT":
            start = pos + len(f" {role}: ")
            spans.append((start, pos + len(seg)))
        parts.append(seg)
        pos += len(seg)
    return "".join(parts), spans


def tokenize_with_images(prompt: str, tokenizer, image_token_id: int,
                         num_image_tokens: int) -> List[int]:
    """Tokenize text around `<image>` markers, expanding each marker to
    `num_image_tokens` placeholder ids (the model splices one vision
    feature per placeholder — neva.py splice; reference
    tokenize_special_token, preloaded.py:203)."""
    ids: List[int] = []
    for i, chunk in enumerate(prompt.split(IMAGE_TOKEN_STR)):
        if i > 0:
            ids.extend([image_token_id] * num_image_tokens)
        if chunk:
            ids.extend(tokenizer.text_to_ids(chunk))
    return ids


class NevaPreloadedDataModule:
    """LLaVA-style JSON manifest → static-shape NeVA batches.

    manifest: [{"image": "x.jpg", "conversations":
    [{"from": "human", "value": "<image>\\nWhat is this?"},
    {"from": "gpt", "value": "A cat."}]}, ...] (reference preloaded.py
    LazySupervisedDataset). Batches: {"images" [B,S,S,3] f32, "tokens"
    [B,L] int32 (placeholders included), "loss_mask" [B,L] — assistant
    tokens only."""

    def __init__(self, manifest_path: str, image_dir: str, tokenizer,
                 image_processor: Optional[CLIPImageProcessor] = None,
                 seq_length: int = 512, global_batch_size: int = 4,
                 image_token_id: int = 32000, num_image_tokens: int = 576,
                 seed: int = 0):
        self.records = json.load(open(manifest_path))
        self.image_dir = image_dir
        self.tokenizer = tokenizer
        self.proc = image_processor or CLIPImageProcessor()
        self.seq_length = seq_length
        self.global_batch_size = global_batch_size
        self.image_token_id = image_token_id
        self.num_image_tokens = num_image_tokens
        self.seed = seed
        self.micro_batch_size = None

    def _example(self, rec):
        from PIL import Image

        prompt, spans = llava_conversation_prompt(rec["conversations"])
        toks: List[int] = []
        mask: List[int] = []
        # walk the prompt split by spans so supervision lands exactly on
        # assistant tokens (reference preloaded.py label masking)
        cursor = 0
        for start, end in spans:
            toks_before = tokenize_with_images(
                prompt[cursor:start], self.tokenizer, self.image_token_id,
                self.num_image_tokens)
            toks += toks_before
            mask += [0] * len(toks_before)
            toks_ans = self.tokenizer.text_to_ids(prompt[start:end])
            toks += toks_ans
            mask += [1] * len(toks_ans)
            cursor = end
        tail = tokenize_with_images(prompt[cursor:], self.tokenizer,
                                    self.image_token_id,
                                    self.num_image_tokens)
        toks += tail
        mask += [0] * len(tail)
        L = self.seq_length
        toks, mask = toks[:L], mask[:L]
        if toks.count(self.image_token_id) != self.num_image_tokens:
            raise ValueError(
                f"example truncated to {L} tokens lost image placeholders "
                f"— raise seq_length (prompt needs "
                f"{self.num_image_tokens} placeholder slots; the model's "
                f"splice contract is exactly that many per row)")
        pad = L - len(toks)
        toks += [0] * pad
        mask += [0] * pad
        img = self.proc(Image.open(os.path.join(self.image_dir,
                                                rec["image"])))
        return np.asarray(toks, np.int32), np.asarray(mask, np.float32), img

    def train_batches(self, start_step: int = 0):
        import jax.numpy as jnp

        rng = np.random.RandomState(self.seed + start_step)
        B = self.global_batch_size
        while True:
            idx = rng.randint(0, len(self.records), B)
            ex = [self._example(self.records[i]) for i in idx]
            yield {
                "tokens": jnp.asarray(np.stack([e[0] for e in ex])),
                "loss_mask": jnp.asarray(np.stack([e[1] for e in ex])),
                "images": jnp.asarray(np.stack([e[2] for e in ex])),
            }


class MockVLMDataModule:
    """Random NeVA-shaped batches (reference neva/data/mock.py)."""

    def __init__(self, seq_length: int = 64, global_batch_size: int = 4,
                 vocab_size: int = 256, image_size: int = 32,
                 image_token_id: int = 255, num_image_tokens: int = 4,
                 seed: int = 0):
        self.seq_length = seq_length
        self.global_batch_size = global_batch_size
        self.vocab_size = vocab_size
        self.image_size = image_size
        self.image_token_id = image_token_id
        self.num_image_tokens = num_image_tokens
        self.seed = seed
        self.micro_batch_size = None

    def train_batches(self, start_step: int = 0):
        import jax.numpy as jnp

        rng = np.random.RandomState(self.seed + start_step)
        B, L, S = (self.global_batch_size, self.seq_length, self.image_size)
        while True:
            toks = rng.randint(1, self.vocab_size, (B, L)).astype(np.int32)
            toks[:, :self.num_image_tokens] = self.image_token_id
            mask = np.ones((B, L), np.float32)
            mask[:, :self.num_image_tokens] = 0.0
            yield {
                "tokens": jnp.asarray(toks),
                "loss_mask": jnp.asarray(mask),
                "images": jnp.asarray(
                    rng.randn(B, S, S, 3).astype(np.float32)),
            }


class TarredVLMDataset:
    """Webdataset/energon-style tar shards of (image, json) sample pairs.

    Each sample is two members sharing a basename key: `<key>.jpg|.png`
    and `<key>.json` holding {"conversations": [...]} — the layout
    Megatron-Energon's CaptioningSample/VQASample webdatasets use
    (reference: vlm task encoders consume energon shards,
    `vlm/neva/data/preloaded.py` is the non-sharded twin). Shards scatter
    across data-parallel workers by index, like TarredAudioDataset."""

    def __init__(self, tar_paths: Sequence[str], shard_rank: int = 0,
                 shard_world: int = 1):
        self.tar_paths = [p for i, p in enumerate(sorted(tar_paths))
                          if i % shard_world == shard_rank]

    def __iter__(self):
        import io
        import tarfile

        from PIL import Image

        for tp in self.tar_paths:
            with tarfile.open(tp) as tar:
                pending: Dict[str, Dict] = {}
                for m in tar.getmembers():
                    base, ext = os.path.splitext(m.name)
                    if ext not in (".jpg", ".jpeg", ".png", ".json"):
                        continue
                    slot = pending.setdefault(base, {})
                    data = tar.extractfile(m).read()
                    if ext == ".json":
                        slot["meta"] = json.loads(data)
                    else:
                        img = Image.open(io.BytesIO(data))
                        img.load()
                        slot["image"] = img
                    if "meta" in slot and "image" in slot:
                        del pending[base]
                        yield {"image": slot["image"], **slot["meta"]}


class TarredVLMDataModule(NevaPreloadedDataModule):
    """NevaPreloadedDataModule over energon-style tar shards: same static
    collation (CLIP preprocess, conversation templating, placeholder
    contract), streaming source instead of a JSON manifest + image dir."""

    def __init__(self, tar_paths: Sequence[str], tokenizer,
                 image_processor: Optional[CLIPImageProcessor] = None,
                 seq_length: int = 512, global_batch_size: int = 4,
                 image_token_id: int = 32000, num_image_tokens: int = 576,
                 shard_rank: int = 0, shard_world: int = 1, seed: int = 0):
        self.ds = TarredVLMDataset(tar_paths, shard_rank, shard_world)
        self.tokenizer = tokenizer
        self.proc = image_processor or CLIPImageProcessor()
        self.seq_length = seq_length
        self.global_batch_size = global_batch_size
        self.image_token_id = image_token_id
        self.num_image_tokens = num_image_tokens
        self.seed = seed
        self.micro_batch_size = None

    def _tar_example(self, rec):
        # reuse the parent collation with the already-decoded PIL image
        prompt, spans = llava_conversation_prompt(rec["conversations"])
        toks: List[int] = []
        mask: List[int] = []
        cursor = 0
        for start, end in spans:
            before = tokenize_with_images(
                prompt[cursor:start], self.tokenizer, self.image_token_id,
                self.num_image_tokens)
            toks += before
            mask += [0] * len(before)
            ans = self.tokenizer.text_to_ids(prompt[start:end])
            toks += ans
            mask += [1] * len(ans)
            cursor = end
        tail = tokenize_with_images(prompt[cursor:], self.tokenizer,
                                    self.image_token_id,
                                    self.num_image_tokens)
        toks += tail
        mask += [0] * len(tail)
        L = self.seq_length
        toks, mask = toks[:L], mask[:L]
        if toks.count(self.image_token_id) != self.num_image_tokens:
            raise ValueError(
                f"example truncated to {L} tokens lost image placeholders")
        pad = L - len(toks)
        return (np.asarray(toks + [0] * pad, np.int32),
                np.asarray(mask + [0] * pad, np.float32),
                self.proc(rec["image"]))

    def train_batches(self, start_step: int = 0):
        import jax.numpy as jnp

        B = self.global_batch_size
        buf = []
        while True:  # loop the shards forever (epoch wraps)
            for rec in self.ds:
                buf.append(self._tar_example(rec))
                if len(buf) == B:
                    yield {
                        "tokens": jnp.asarray(
                            np.stack([e[0] for e in buf])),
                        "loss_mask": jnp.asarray(
                            np.stack([e[1] for e in buf])),
                        "images": jnp.asarray(
                            np.stack([e[2] for e in buf])),
                    }
                    buf = []
