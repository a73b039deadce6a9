"""Prefix-cached serving loops for the eval harness (split out of
harness.py, round 4). Family specifics (key/plan construction) stay on the
evaluator classes (harness.py _prefix_key/_prefix_plan); these mixin loops
only orchestrate groups, warm-ups, timing rows, and emission."""

from __future__ import annotations

import time

import jax.numpy as jnp

from ..runtime.reducer import ReducerSpec  # noqa: F401 (type context)
from .harness_common import EvalConfig, _spec_histories
from .reporting import prompt_stat_ratios


class PrefixCachedMixin:
    def _evaluate_prefix_cached(self, samples, cfg: EvalConfig, pred_path, rt_path, stat_path):
        """Prefix-cached serving: questions grouped by (vid, system prefix);
        each group prefills the question-independent prefix once (merge
        included) and every question runs as a cache extension + decode.
        Token-exact vs the per-question full prefill
        (tests/test_prefix_cache.py); family specifics live in
        _prefix_key/_prefix_plan."""
        from collections import defaultdict

        import jax

        from ..runtime.generate import generate_from_prefix

        groups: dict = defaultdict(list)
        for s in samples:
            key = self._prefix_key(s)
            groups[key if key is not None else ("solo", s["id"])].append(s)

        gen = cfg.gen_config()
        warmed: set = set()
        for key, grp in groups.items():
            plan = None
            if key[0] != "solo" and len(grp) > 1:
                plan = self._prefix_plan(key, grp, cfg)
            if plan is None:
                # singletons / FrameFusion etc.: normal per-sample path,
                # warmed per compile key like the unbatched loop
                for s in grp:
                    k = self.compile_key(s, cfg)
                    if cfg.warmup and k not in warmed:
                        self.run_sample(s, cfg)
                        warmed.add(k)
                    self._emit(s, *self.run_sample(s, cfg), pred_path, rt_path, stat_path)
                continue

            if cfg.batch_size > 1:
                self._run_prefix_group_batched(
                    grp, plan, cfg, gen, warmed, pred_path, rt_path, stat_path
                )
                continue

            spec = plan["spec"]
            run_prefill = plan["run_prefill"]
            suffix_embeds = plan["suffix_embeds"]
            insts = plan["insts"]
            wkey = ("prefix", plan["s_full"], plan["s_sfx"], spec)
            if cfg.warmup and wkey not in warmed:
                generate_from_prefix(
                    self.decoder_params, self.decoder_cfg, run_prefill(),
                    suffix_embeds(insts[0]), len(insts[0]), spec, gen,
                )
                warmed.add(wkey)

            t0 = time.perf_counter()
            cache = jax.block_until_ready(run_prefill())
            prefill_time = time.perf_counter() - t0
            for i, (s, inst) in enumerate(zip(grp, insts)):
                t0 = time.perf_counter()
                ids, runtime = generate_from_prefix(
                    self.decoder_params, self.decoder_cfg, cache,
                    suffix_embeds(inst), len(inst), spec, gen,
                )
                runtime["all"] = time.perf_counter() - t0
                if i == 0:
                    runtime["prefix_prefill_time"] = prefill_time
                text = self.tokenizer.decode(
                    [t for t in ids if t not in cfg.eos_token_ids],
                    skip_special_tokens=True,
                ).strip()
                merged_input = runtime["merged_len"]
                valid = plan["prefix_valid"] + len(inst)
                stat = prompt_stat_ratios({
                    "sys": plan["sys_len"], "video": plan["n_video"],
                    "inst": len(inst),
                    "merged_video": merged_input - (valid - plan["n_video"]),
                    "merged_input": merged_input,
                })
                self._emit(s, text, runtime, stat, pred_path, rt_path, stat_path)

    def _run_prefix_group_batched(
        self, grp, plan, cfg: EvalConfig, gen, warmed, pred_path, rt_path, stat_path
    ):
        """The two serving levers composed for one video's question group:
        prefix prefill once, then the questions run in head-packed batches of
        ``cfg.batch_size`` over the shared cache (generate_batch_from_prefix,
        token-exact). Timing rows carry batch totals divided by the batch
        (like _evaluate_batched) plus prefix_prefill_time on the first row."""
        import jax

        from ..runtime.generate import generate_batch_from_prefix

        spec = plan["spec"]
        run_prefill = plan["run_prefill"]
        suffix_embeds = plan["suffix_embeds"]
        insts = plan["insts"]

        def run_batch(cache, chunk_insts, chunk_samples=None):
            sfx = jnp.concatenate([suffix_embeds(i) for i in chunk_insts])
            speculative = cfg.spec_decode_k > 1
            return generate_batch_from_prefix(
                self.decoder_params, self.decoder_cfg, cache, sfx,
                [len(i) for i in chunk_insts], spec, gen,
                decode_chunk_size=cfg.decode_chunk_size,
                cascade=cfg.prefix_cascade,
                spec_decode_k=cfg.spec_decode_k if speculative else 0,
                histories=_spec_histories(chunk_samples)
                if speculative and chunk_samples is not None else None,
                kv_int8=cfg.kv_int8,
            )

        # The traced batch size is part of the compiled program (head-packed
        # cache [Lg, 1, S, B*KV, hd]), so each distinct chunk size (incl. the
        # tail) warms separately; the warm-up prefill also compiles the
        # prefix program untimed.
        if cfg.warmup:
            wcache = None
            for i in range(0, len(grp), cfg.batch_size):
                bsz = len(grp[i : i + cfg.batch_size])
                wkey = ("prefix-batch", plan["s_full"], plan["s_sfx"], spec,
                        bsz, cfg.decode_chunk_size, cfg.prefix_cascade,
                        cfg.spec_decode_k)
                if wkey in warmed:
                    continue
                if wcache is None:
                    wcache = run_prefill()
                run_batch(wcache, [insts[0]] * bsz)
                warmed.add(wkey)
            del wcache

        t0 = time.perf_counter()
        cache = jax.block_until_ready(run_prefill())
        prefill_time = time.perf_counter() - t0
        first = True
        for i in range(0, len(grp), cfg.batch_size):
            chunk_s = grp[i : i + cfg.batch_size]
            chunk_i = insts[i : i + cfg.batch_size]
            b = len(chunk_s)
            t0 = time.perf_counter()
            ids_list, rt = run_batch(cache, chunk_i, chunk_s)
            total = time.perf_counter() - t0
            for bi, (s, inst) in enumerate(zip(chunk_s, chunk_i)):
                text = self.tokenizer.decode(
                    [t for t in ids_list[bi] if t not in cfg.eos_token_ids],
                    skip_special_tokens=True,
                ).strip()
                merged_input = rt["merged_len"][bi]
                valid = plan["prefix_valid"] + len(inst)
                stat = prompt_stat_ratios({
                    "sys": plan["sys_len"], "video": plan["n_video"],
                    "inst": len(inst),
                    "merged_video": merged_input - (valid - plan["n_video"]),
                    "merged_input": merged_input,
                })
                runtime = {
                    "ttft_llm": rt["ttft_llm"] / b,
                    "time_decoding": rt["time_decoding"] / b,
                    "num_dec_token": rt["num_dec_token"][bi],
                    "merged_len": merged_input,
                    "full_len": rt["full_len"][bi],
                    "budget_overflow": rt["budget_overflow"][bi],
                    "all": total / b,
                    "batch_size": b,
                    "prefix_cached": True,
                    # batch totals, present under --spec_decode_k
                    **{k: rt[k] for k in
                       ("spec_drafted", "spec_accepted", "spec_dispatches")
                       if k in rt},
                }
                if first:
                    runtime["prefix_prefill_time"] = prefill_time
                    first = False
                self._emit(s, text, runtime, stat, pred_path, rt_path, stat_path)
