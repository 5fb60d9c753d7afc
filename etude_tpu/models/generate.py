"""KV-cached on-device bar generation engine.

The reference generates each bar with a Python token-at-a-time loop around the
model, syncing to host for every sample (etude/models/etude_decoder.py:209-353).
Here the whole per-bar procedure — prefill over the (left-padded, bucketed)
prompt, then a `lax.while_loop` of single-token decode steps with on-device
temperature/top-p sampling and Bar_EOS early exit — is a single jit-compiled
XLA program per prompt-length bucket. The host only assembles prompts
(history windowing + truncation, identical semantics to the reference) and
collects finished bars.

Batching: the batch dimension carries independent generation streams — e.g.
the 27-attribute sweep decodes one song under all attribute combinations in
one program.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import SRC_CLASS_ID, TGT_CLASS_ID
from ..ops.sampling import sample_token
from ..utils.logger import logger
from .decoder import (
    ATTRIBUTE_ORDER,
    EtudeDecoderConfig,
    Params,
    forward_with_cache,
    init_cache,
)

# Host-side attribute key spelling used by callers (reference CLI surface).
ATTR_KEYS = ("pitch_overlap_bin", "polyphony_bin", "rhythm_intensity_bin", "sustain_bin")
_ATTR_KEY_TO_NAME = {
    "pitch_overlap_bin": "pitch_overlap",
    "polyphony_bin": "polyphony",
    "sustain_bin": "sustain",
    "rhythm_intensity_bin": "rhythm_intensity",
}


def _round_up_to_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in sorted(buckets):
        if n <= b:
            return b
    return max(buckets)


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_new_tokens", "bar_eos_id", "pad_id"),
)
def generate_bar(
    params: Params,
    config: EtudeDecoderConfig,
    prompt_ids: jnp.ndarray,     # [B, P] int32, LEFT-padded
    class_ids: jnp.ndarray,      # [B, P] int32
    attr_ids: Dict[str, jnp.ndarray],  # each [B, P] int32
    visible_from: jnp.ndarray,   # [B] int32: first real slot per element
    cur_attrs: Dict[str, jnp.ndarray],  # each [B] int32: target-bar attrs
    rng: jax.Array,
    temperature: jnp.ndarray,    # scalar f32
    top_p: jnp.ndarray,          # scalar f32
    *,
    max_new_tokens: int,
    bar_eos_id: int,
    pad_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate up to max_new_tokens target tokens after the prompt.

    Returns (tokens [B, max_new_tokens] with pad after EOS, counts [B]).
    The prompt's final token is the Bar_BOS starting the target bar.
    """
    B, P = prompt_ids.shape

    # Pre-cast matmul weights to bf16 once, outside the decode loop (same
    # numerics as the per-use cast; keeps the loop body reading 2-byte
    # buffers — see generate_stream.generate_song_stream).
    params = dict(params)
    params["layers"] = {
        name: (block if name in ("ln1", "ln2") else
               jax.tree.map(lambda a: a.astype(jnp.bfloat16), block))
        for name, block in params["layers"].items()
    }

    # Cache sized to this bucket's window: P prompt slots + the generation
    # budget (bounded by max_position_embeddings).
    cache_len = min(P + max_new_tokens, config.max_position_embeddings)
    cache = init_cache(config, B, length=cache_len)
    positions = jnp.maximum(
        jnp.arange(P)[None, :] - visible_from[:, None], 0
    ).astype(jnp.int32)

    logits, cache = forward_with_cache(
        params, config, cache, prompt_ids, class_ids, attr_ids,
        write_pos=jnp.int32(0), positions=positions, visible_from=visible_from,
    )
    last_logits = logits[:, -1]  # [B, V] — prompts are right-aligned at slot P-1

    tgt_class = jnp.full((B, 1), TGT_CLASS_ID, jnp.int32)
    step_attrs = {name: cur_attrs[name][:, None] for name in ATTRIBUTE_ORDER}

    out_tokens0 = jnp.full((B, max_new_tokens), pad_id, jnp.int32)
    done0 = jnp.zeros((B,), bool)
    counts0 = jnp.zeros((B,), jnp.int32)

    def cond(state):
        i, _, _, done, _, _, _ = state
        return (i < max_new_tokens) & (~jnp.all(done))

    def body(state):
        i, last_logits, cache, done, out_tokens, counts, rng = state
        rng, sub = jax.random.split(rng)
        tok = sample_token(last_logits, sub, temperature, top_p).astype(jnp.int32)
        tok = jnp.where(done, pad_id, tok)
        out_tokens = jax.lax.dynamic_update_slice(
            out_tokens, tok[:, None], (0, i)
        )
        counts = counts + jnp.where(done, 0, 1)
        done = done | (tok == bar_eos_id)

        write_pos = P + i
        step_pos = (write_pos - visible_from)[:, None].astype(jnp.int32)
        logits, cache = forward_with_cache(
            params, config, cache, tok[:, None], tgt_class, step_attrs,
            write_pos=write_pos, positions=step_pos, visible_from=visible_from,
        )
        return (i + 1, logits[:, 0], cache, done, out_tokens, counts, rng)

    state = (jnp.int32(0), last_logits, cache, done0, out_tokens0, counts0, rng)
    _, _, _, _, out_tokens, counts, _ = jax.lax.while_loop(cond, body, state)
    return out_tokens, counts


class GenerationEngine:
    """Host orchestration of bar-by-bar song generation.

    Mirrors the reference prompt contract: 4 most-recent (X, Y) history pairs
    (empty [BOS, EOS] bars with neutral attributes where history is short),
    then the current condition bar X_i carrying the *target* attributes, then
    a Bar_BOS opener — truncated to the last max_pos * overlap_ratio tokens
    when the prompt would crowd the generation window.
    """

    def __init__(
        self,
        config: EtudeDecoderConfig,
        bar_bos_id: int,
        bar_eos_id: int,
        pad_id: int = 0,
        prompt_buckets: Sequence[int] = (128, 256, 384, 512),
        max_bar_token_limit: int = 512,
        context_overlap_ratio: float = 0.5,
        prompt_cap: Optional[int] = None,
    ):
        self.config = config
        self.bar_bos_id = bar_bos_id
        self.bar_eos_id = bar_eos_id
        self.pad_id = pad_id
        self.max_bar_token_limit = min(
            max_bar_token_limit, config.max_position_embeddings
        )
        self.context_overlap_ratio = context_overlap_ratio
        # Prompt cap: leave a full generation window inside max_pos. A caller
        # may tighten it further (e.g. to pin generation to one bucket — one
        # compiled program).
        derived_cap = max(
            config.max_position_embeddings - self.max_bar_token_limit, 1
        )
        self.prompt_cap = min(prompt_cap, derived_cap) if prompt_cap else derived_cap
        # Buckets below the cap, plus the cap itself so every legal prompt
        # fits some bucket.
        self.prompt_buckets = sorted(
            {b for b in prompt_buckets if b < self.prompt_cap} | {self.prompt_cap}
        )

    # ---- prompt assembly (host) ---------------------------------------
    def build_prompt(
        self,
        history: List[Tuple[List[int], List[int], Dict[str, int]]],
        current_x: List[int],
        current_attrs: Dict[str, int],
    ) -> Tuple[List[int], List[int], Dict[str, List[int]]]:
        """Token/class/attribute streams for one bar's prompt (+ Bar_BOS)."""
        n_ctx = self.config.context_num_past_xy_pairs
        empty_bar = [self.bar_bos_id, self.bar_eos_id]
        neutral = {k: 1 for k in ATTR_KEYS}

        tokens: List[int] = []
        classes: List[int] = []
        attrs: Dict[str, List[int]] = {k: [] for k in ATTR_KEYS}

        used = history[-n_ctx:]
        for _ in range(n_ctx - len(used)):
            for class_id in (SRC_CLASS_ID, TGT_CLASS_ID):
                tokens.extend(empty_bar)
                classes.extend([class_id] * len(empty_bar))
                for k in ATTR_KEYS:
                    attrs[k].extend([neutral[k]] * len(empty_bar))
        for x_ids, y_ids, h_attrs in used:
            for item_ids, class_id in ((x_ids, SRC_CLASS_ID), (y_ids, TGT_CLASS_ID)):
                tokens.extend(item_ids)
                classes.extend([class_id] * len(item_ids))
                for k in ATTR_KEYS:
                    attrs[k].extend([h_attrs[k]] * len(item_ids))

        tokens.extend(current_x)
        classes.extend([SRC_CLASS_ID] * len(current_x))
        for k in ATTR_KEYS:
            attrs[k].extend([current_attrs[k]] * len(current_x))

        if len(tokens) > self.prompt_cap - 1:
            keep = int(
                self.config.max_position_embeddings * self.context_overlap_ratio
            ) - 1
            # The kept prompt must leave room for the Bar_BOS opener within
            # the cap (and thus within the largest bucket).
            keep = max(min(keep, self.prompt_cap - 1), 1)
            tokens = tokens[-keep:]
            classes = classes[-keep:]
            for k in ATTR_KEYS:
                attrs[k] = attrs[k][-keep:]

        # Bar_BOS opener for the target bar.
        tokens.append(self.bar_bos_id)
        classes.append(TGT_CLASS_ID)
        for k in ATTR_KEYS:
            attrs[k].append(current_attrs[k])
        return tokens, classes, attrs

    def _pack_prompts(self, prompts) -> Tuple[np.ndarray, np.ndarray, Dict, np.ndarray, int]:
        """Left-pad a list of (tokens, classes, attrs) to a common bucket."""
        max_len = max(len(p[0]) for p in prompts)
        P = _round_up_to_bucket(max_len, self.prompt_buckets)
        B = len(prompts)
        ids = np.full((B, P), self.pad_id, np.int32)
        classes = np.zeros((B, P), np.int32)
        attrs = {k: np.zeros((B, P), np.int32) for k in ATTR_KEYS}
        visible_from = np.zeros((B,), np.int32)
        for b, (toks, cls, att) in enumerate(prompts):
            n = len(toks)
            ids[b, P - n:] = toks
            classes[b, P - n:] = cls
            for k in ATTR_KEYS:
                attrs[k][b, P - n:] = att[k]
            visible_from[b] = P - n
        return ids, classes, attrs, visible_from, P

    # ---- song generation ----------------------------------------------
    def generate(
        self,
        params: Params,
        all_x_bars: List[List[int]],
        target_attributes_per_bar: List[Dict[str, int]],
        *,
        temperature: float = 0.0,
        top_p: float = 0.9,
        max_output_tokens: int = 25600,
        seed: int = 0,
        progress: bool = False,
    ) -> List[List[int]]:
        """Generate target bars for one song (batch of one stream).

        Returns the generated bar token lists ([Bar_BOS, ..., Bar_EOS] each).
        """
        streams = self.generate_batch(
            params,
            [all_x_bars],
            [target_attributes_per_bar],
            temperature=temperature,
            top_p=top_p,
            max_output_tokens=max_output_tokens,
            seed=seed,
            progress=progress,
        )
        return streams[0]

    def generate_batch(
        self,
        params: Params,
        x_bars_per_stream: List[List[List[int]]],
        attrs_per_stream: List[List[Dict[str, int]]],
        *,
        temperature: float = 0.0,
        top_p: float = 0.9,
        max_output_tokens: int = 25600,
        seed: int = 0,
        progress: bool = False,
        forced_history_y: Optional[List[List[List[int]]]] = None,
    ) -> List[List[List[int]]]:
        """Generate N independent streams in lockstep (batched on device).

        Streams may have different bar counts; exhausted streams decode
        against an empty condition bar and their output is discarded.

        forced_history_y (teacher-forced-history evaluation): per stream, the
        TRUE target bars; after generating bar i the history receives the
        true Y_i instead of the generated one, so each bar is cloned from
        the exact context the distillation training saw — per-bar fidelity
        without compounding free-running drift.
        """
        B = len(x_bars_per_stream)
        if B == 0:
            return []
        num_bars = max(len(s) for s in x_bars_per_stream)
        histories: List[List[Tuple]] = [[] for _ in range(B)]
        outputs: List[List[List[int]]] = [[] for _ in range(B)]
        totals = np.zeros(B, np.int64)
        empty_bar = [self.bar_bos_id, self.bar_eos_id]
        neutral = {k: 1 for k in ATTR_KEYS}

        rng = jax.random.PRNGKey(seed)
        bar_iter = range(num_bars)
        if progress:
            import tqdm

            bar_iter = tqdm.tqdm(bar_iter, desc="Generating bars", unit="bar")

        for bar_idx in bar_iter:
            prompts = []
            cur_attr_arrays = {name: np.zeros(B, np.int32) for name in ATTRIBUTE_ORDER}
            for b in range(B):
                stream = x_bars_per_stream[b]
                if bar_idx < len(stream):
                    x_ids = stream[bar_idx]
                    attrs = attrs_per_stream[b][bar_idx]
                else:
                    x_ids, attrs = empty_bar, neutral
                prompts.append(self.build_prompt(histories[b], x_ids, attrs))
                for key in ATTR_KEYS:
                    cur_attr_arrays[_ATTR_KEY_TO_NAME[key]][b] = attrs[key]

            ids, classes, attrs_np, visible_from, P = self._pack_prompts(prompts)
            attr_ids = {
                _ATTR_KEY_TO_NAME[k]: jnp.asarray(attrs_np[k]) for k in ATTR_KEYS
            }
            rng, sub = jax.random.split(rng)
            tokens, counts = generate_bar(
                params, self.config,
                jnp.asarray(ids), jnp.asarray(classes), attr_ids,
                jnp.asarray(visible_from),
                {k: jnp.asarray(v) for k, v in cur_attr_arrays.items()},
                sub,
                jnp.float32(temperature), jnp.float32(top_p),
                max_new_tokens=self.max_bar_token_limit,
                bar_eos_id=self.bar_eos_id,
                pad_id=self.pad_id,
            )
            tokens = np.asarray(tokens)
            counts = np.asarray(counts)

            for b in range(B):
                stream = x_bars_per_stream[b]
                if bar_idx >= len(stream) or totals[b] >= max_output_tokens:
                    continue
                bar_tokens = tokens[b, : counts[b]].tolist()
                totals[b] += len(bar_tokens)
                generated = [self.bar_bos_id] + bar_tokens
                x_ids = stream[bar_idx]
                attrs = attrs_per_stream[b][bar_idx]
                hist_y = generated
                if forced_history_y is not None and bar_idx < len(
                    forced_history_y[b]
                ):
                    hist_y = forced_history_y[b][bar_idx]
                histories[b].append((x_ids, hist_y, attrs))
                if len(histories[b]) > self.config.context_num_past_xy_pairs:
                    histories[b].pop(0)
                outputs[b].append(generated)

            if all(totals[b] >= max_output_tokens for b in range(B)):
                logger.warn("max_output_tokens reached on all streams; stopping.")
                break

        return outputs
