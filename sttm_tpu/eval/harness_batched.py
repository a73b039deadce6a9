"""Head-packed batched serving loop + the evaluate() dispatcher for the
eval harness (split out of harness.py, round 4)."""

from __future__ import annotations

import os
import time

from ..runtime.reducer import ReducerSpec
from . import metrics as metrics_mod
from .harness_common import EvalConfig, _spec_histories
from .reporting import append_jsonl, prompt_stat_ratios, read_jsonl


class BatchedMixin:
    def _evaluate_batched(self, samples, cfg: EvalConfig, pred_path, rt_path, stat_path):
        """Head-packed batched serving over the eval set: samples grouped by
        compile key (identical padded length / spec), decoded together via
        generate_batch (beyond the reference's strict batch=1). Timing rows
        carry batch totals divided by the batch plus a batch_size field."""
        from collections import defaultdict

        from ..runtime.generate import generate_batch

        groups = defaultdict(list)
        for s in samples:
            groups[self.compile_key(s, cfg)].append(s)
        chunked = cfg.decode_chunk_size  # 1 = per-step dispatch, as documented
        warmed: set = set()
        for key, grp in groups.items():
            for i in range(0, len(grp), cfg.batch_size):
                chunk = grp[i : i + cfg.batch_size]
                preps = [self._prepare(s, cfg.pad_multiple, cfg.frame_bucket) for s in chunk]
                spec = preps[0][4]
                if not (spec is None or isinstance(spec, (ReducerSpec, tuple))):
                    # FrameFusion etc.: no batched path — per-sample fallback
                    # (warmed per compile key like the unbatched loop, so the
                    # first timed row doesn't absorb the jit compile)
                    for s in chunk:
                        if cfg.warmup and ("sample", key) not in warmed:
                            self.run_sample(s, cfg)
                            warmed.add(("sample", key))
                        self._emit(s, *self.run_sample(s, cfg),
                                   pred_path, rt_path, stat_path)
                    continue
                import jax.numpy as jnp

                embs = jnp.concatenate([p[0] for p in preps], axis=0)
                valids = [int(p[1]) for p in preps]
                vstarts = [int(p[2]) for p in preps]
                pos_bases = [p[5] for p in preps]
                t_valids = [p[6] for p in preps]
                pb = None if all(v is None for v in pos_bases) else pos_bases
                tv = None if all(v is None for v in t_valids) else t_valids

                def run():
                    return generate_batch(
                        self.decoder_params, self.decoder_cfg, embs, valids,
                        vstarts, spec,
                        cfg.gen_config(),
                        impl=cfg.attention_impl, decode_chunk_size=chunked,
                        pos_bases=pb, t_valids=tv,
                        spec_decode_k=cfg.spec_decode_k,
                        histories=_spec_histories(chunk)
                        if cfg.spec_decode_k > 1 else None,
                        kv_int8=cfg.kv_int8,
                    )

                # The traced batch size is part of the compiled program's
                # shape (head-packed cache [Lg, 1, S, B*KV, hd]), so a tail
                # chunk smaller than batch_size needs its own warm-up.
                wkey = (key, len(chunk))
                if cfg.warmup and wkey not in warmed:
                    run()
                    warmed.add(wkey)
                t0 = time.perf_counter()
                ids_list, rt = run()
                total = time.perf_counter() - t0
                b = len(chunk)
                for bi, s in enumerate(chunk):
                    ids = ids_list[bi]
                    text = self.tokenizer.decode(
                        [t for t in ids if t not in cfg.eos_token_ids],
                        skip_special_tokens=True,
                    ).strip()
                    nv = preps[bi][3]
                    merged_input = rt["merged_len"][bi]
                    stat = prompt_stat_ratios({
                        "sys": vstarts[bi],
                        "video": nv,
                        "inst": valids[bi] - vstarts[bi] - nv,
                        "merged_video": merged_input - (valids[bi] - nv),
                        "merged_input": merged_input,
                    })
                    runtime = {
                        "ttft_llm": rt["ttft_llm"] / b,
                        "time_decoding": rt["time_decoding"] / b,
                        "num_dec_token": rt["num_dec_token"][bi],
                        "merged_len": merged_input,
                        "full_len": valids[bi],
                        "all": total / b,
                        "batch_size": b,
                        # batch totals, present under --spec_decode_k
                        **{k: rt[k] for k in
                           ("spec_drafted", "spec_accepted", "spec_dispatches")
                           if k in rt},
                    }
                    self._emit(s, text, runtime, stat,
                               pred_path, rt_path, stat_path)


class EvaluateLoopMixin:
    """The resumable-JSONL evaluation dispatcher + per-sample fallback loop
    (reference: eval_vidqa_by_feat_llavavideo.py:182-252) and the shared
    emit helper. Serving modes dispatch by config compatibility: pooled >
    prefix-cached > batched > per-sample."""

    def _emit(self, sample, text, runtime, stat, pred_path, rt_path, stat_path):
        append_jsonl(pred_path, {
            "question_id": sample["id"], "vid": sample["vid"],
            "answer": text, "gt": sample["answer"],
        })
        append_jsonl(rt_path, {"question_id": sample["id"], **runtime})
        append_jsonl(stat_path, {"question_id": sample["id"], **stat})

    def _sample_features(self, sample: dict):
        import jax.numpy as jnp

        return jnp.asarray(sample["feature"])

    def evaluate(self, dataset, cfg: EvalConfig, gts: list[dict] | None = None):
        os.makedirs(cfg.out_dir, exist_ok=True)
        pred_path = os.path.join(cfg.out_dir, "predictions.jsonl")
        rt_path = os.path.join(cfg.out_dir, "runtime.jsonl")
        stat_path = os.path.join(cfg.out_dir, "prompt_stat.jsonl")

        done = {r["question_id"] for r in read_jsonl(pred_path)}
        pending = [s for s in dataset if s["id"] not in done]
        batchable = (
            cfg.batch_size > 1
            and hasattr(self, "_prepare")
            and cfg.dycoke_decode is None
            and cfg.attn_sinks == 0
            and cfg.attn_window == 0
        )
        base_prefix_ok = (
            cfg.prefix_cache
            and cfg.sp == 1
            and cfg.dycoke_decode is None
            and cfg.attn_sinks == 0
            and cfg.attn_window == 0
            and cfg.frame_bucket == 0
        )
        pool_ok = (
            base_prefix_ok
            and cfg.prefix_pool > 0
            and not cfg.prefix_cascade
            and getattr(self, "_evaluate_prefix_pooled", None) is not None
        )
        prefix_ok = (
            base_prefix_ok
            and getattr(self, "_evaluate_prefix_cached", None) is not None
            # speculative decode composes with the batched prefix path
            # (flat or cascade layout)
            and (cfg.spec_decode_k <= 1 or cfg.batch_size > 1)
            # chunked decode composes with the batched prefix path only
            and (cfg.batch_size > 1 or cfg.decode_chunk_size == 1)
        )
        if pool_ok:
            self._evaluate_prefix_pooled(pending, cfg, pred_path, rt_path, stat_path)
            pending = []
        elif prefix_ok:
            self._evaluate_prefix_cached(pending, cfg, pred_path, rt_path, stat_path)
            pending = []
        elif batchable:
            self._evaluate_batched(pending, cfg, pred_path, rt_path, stat_path)
            pending = []
        warmed_keys: set = set()
        for sample in pending:
            if cfg.warmup:  # one untimed warm-up per NEW compile key
                key = self.compile_key(sample, cfg)
                if key not in warmed_keys:
                    self.run_sample(sample, cfg)
                    warmed_keys.add(key)
            self._emit(sample, *self.run_sample(sample, cfg),
                       pred_path, rt_path, stat_path)

        preds = read_jsonl(pred_path)
        result = metrics_mod.evaluate_predictions(cfg.dataset_name, preds, gts)
        if "total" in result:
            metrics_mod.write_metrics_csv(
                result, os.path.join(cfg.out_dir, "accuracy.csv"), os.path.basename(cfg.out_dir)
            )
        return result
