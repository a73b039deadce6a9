"""w8a8 benchmark-accuracy PROXY on a distilled model (VERDICT r4 #9).

Real checkpoints and benchmark data are unreachable here (zero egress), so
the headline serving mode's accuracy (int8 weights + dynamic per-token int8
activations) has so far only been CPU-drift-bounded on random weights
(GAPS.md #2). Random weights are a WORST case for that question: argmax
margins are ~0 everywhere, so any perturbation flips tokens. A model that
has actually learned something has real margins, and the right distributional
question is: how often does w8a8 flip the greedy token AS A FUNCTION OF the
bf16 model's own top1-top2 logit margin?

Protocol:
  1. Train the TINY config (models/config.py) for a few hundred SFT steps on
     a synthetic structured language with a CONTROLLED margin spectrum: two
     fixed random permutations P1/P2 compete for the next token. After an
     even-id token the data follows P1 with 0.75 / P2 with 0.10 (the model
     learns a decisive prediction, margin ~ln(.75/.10) ≈ 2); after an odd-id
     token it is 0.47 / 0.43 (a genuine near-tie, margin ≈ 0.09); the rest
     is uniform noise. A first draft of this bench followed ONE permutation
     — the model's greedy chain then only ever visited decisive positions
     and every margin landed >= 2 with zero flips (an uninformative pass);
     the two-permutation mix is what populates the near-tie buckets where
     flips actually live.
  2. Quantize the trained weights (models/quant.quantize_params) and run the
     act-quant trunk (the exact headline w8a8 code path in models/qwen2.py).
  3. TEACHER-FORCED flips: one forward per model over the SAME contexts —
     both data-distribution sequences (all margin regimes appear) and the
     bf16 greedy chains (the serving distribution) — comparing argmaxes at
     every position and recording the bf16 top1-top2 margin. Report flip
     rate per margin bucket.
  4. FREE-RUNNING divergence: decode both models greedily from the same
     prompts; report exact-match rate and first-divergence position.

Writes BENCH_W8A8_PROXY_TINY.json. CPU f32 (numerics claim, not perf —
argmax exactness rules, CLAUDE.md). Usage: python scripts/bench_w8a8_proxy.py
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--train_batch", type=int, default=32)
    ap.add_argument("--train_len", type=int, default=64)
    ap.add_argument("--n_prompts", type=int, default=256)
    ap.add_argument("--prompt_len", type=int, default=16)
    ap.add_argument("--gen_len", type=int, default=32)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, ".")
    from sttm_tpu.models import qwen2
    from sttm_tpu.models.config import TINY
    from sttm_tpu.models.quant import quantize_params
    from sttm_tpu.train.sft import make_train_step

    rng = np.random.default_rng(0)
    cfg = TINY
    lo_tok, hi_tok = 10, 250  # reserve low ids; stay under vocab 256
    nxt1 = np.zeros(cfg.vocab_size, np.int64)
    nxt2 = np.zeros(cfg.vocab_size, np.int64)
    nxt1[lo_tok:hi_tok] = rng.permutation(np.arange(lo_tok, hi_tok))
    nxt2[lo_tok:hi_tok] = rng.permutation(np.arange(lo_tok, hi_tok))

    def sample_seqs(n, length):
        out = np.empty((n, length), np.int64)
        out[:, 0] = rng.integers(lo_tok, hi_tok, size=n)
        for t in range(1, length):
            cur = out[:, t - 1]
            # even tokens: decisive (0.75/0.10); odd: near-tie (0.47/0.43)
            p1 = np.where(cur % 2 == 0, 0.75, 0.47)
            p2 = np.where(cur % 2 == 0, 0.10, 0.43)
            u = rng.random(n)
            out[:, t] = np.where(
                u < p1, nxt1[cur],
                np.where(u < p1 + p2, nxt2[cur],
                         rng.integers(lo_tok, hi_tok, size=n)))
        return out.astype(np.int32)

    # -- 1. train ---------------------------------------------------------
    params = qwen2.init_params(cfg, jax.random.key(0))
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    step = jax.jit(make_train_step(cfg, tx))
    loss0 = loss = None
    for i in range(args.steps):
        ids = jnp.asarray(sample_seqs(args.train_batch, args.train_len))
        params, opt, loss = step(params, opt, ids, ids)
        if i == 0:
            loss0 = float(loss)
    loss = float(loss)
    # the deterministic 85% of transitions must be essentially learned:
    # CE floor ~ 0.85*ln(1/0.85-ish) + 0.15*ln(240) ≈ 1.0; random ~ ln(240)=5.5
    print(f"train CE {loss0:.3f} -> {loss:.3f}", flush=True)

    # -- 2. quantize: the headline w8a8 mode plus the two weight-only
    # serving modes (int8 = the 1.96x point; int4 = the capacity mode) so
    # the flip-rate statement covers every shipped quantization tier ----
    params_q8 = quantize_params(params, host=True, bits=8)
    modes = {
        "int8w8a": (params_q8, dataclasses.replace(cfg, act_quant=True)),
        "int8_weight_only": (params_q8, cfg),
        "int4_weight_only": (quantize_params(params, host=True, bits=4),
                             cfg),
    }

    def logits_fn(p, c, ids):
        x = qwen2.embed_tokens(p, ids, c)
        b, s, _ = x.shape
        cos, sin = qwen2.rope_cos_sin(c, jnp.arange(s, dtype=jnp.int32))
        x, _, _ = qwen2.prefill_layers(p["layers"], 0, c.num_layers, x, cos,
                                       sin, s, c, "xla")
        h = qwen2.rms_norm(x, p["norm"], c.rms_eps, c.rms_offset)
        return qwen2.lm_head(p, c, h)  # [B, S, V] fp32

    f_bf = jax.jit(lambda ids: logits_fn(params, cfg, ids))

    # -- 3. teacher-forced flip-vs-margin ---------------------------------
    def flips_on(f_q, contexts, from_pos):
        lg_bf = np.asarray(f_bf(jnp.asarray(contexts)))
        lg_q = np.asarray(f_q(jnp.asarray(contexts)))
        pos = slice(from_pos, contexts.shape[1] - 1)
        a_bf = lg_bf[:, pos].argmax(-1)
        a_q = lg_q[:, pos].argmax(-1)
        top2 = np.sort(lg_bf[:, pos], axis=-1)
        margin = (top2[..., -1] - top2[..., -2]).ravel()
        return margin, (a_bf != a_q).ravel()

    def bucketize(margin, flip):
        buckets = [0.0, 0.1, 0.25, 0.5, 1.0, 2.0, np.inf]
        rows = []
        for lo, hi in zip(buckets[:-1], buckets[1:]):
            m = (margin >= lo) & (margin < hi)
            rows.append({
                "margin": f"[{lo}, {hi})",
                "n": int(m.sum()),
                "flip_rate": round(float(flip[m].mean()), 4) if m.any()
                else None,
            })
        return {
            "n_positions": int(flip.size),
            "overall_flip_rate": round(float(flip.mean()), 4),
            "median_margin": round(float(np.median(margin)), 3),
            "by_margin": rows,
        }

    # shared contexts across modes (same prompts -> comparable numbers)
    data_seqs = sample_seqs(args.n_prompts, args.prompt_len + args.gen_len)
    prompts = sample_seqs(args.n_prompts, args.prompt_len)
    ctx = np.asarray(prompts)
    for _ in range(args.gen_len):  # batched greedy rollout of the base model
        lg = np.asarray(f_bf(jnp.asarray(ctx))[:, -1])
        ctx = np.concatenate([ctx, lg.argmax(-1)[:, None].astype(np.int32)], 1)
    chains = ctx  # [N, prompt+gen]

    per_mode = {}
    for mode, (p_q, c_q) in modes.items():
        f_q = jax.jit(lambda ids, p_q=p_q, c_q=c_q: logits_fn(p_q, c_q, ids))
        tf_data = bucketize(*flips_on(f_q, data_seqs, args.prompt_len - 1))
        tf_chain = bucketize(*flips_on(f_q, chains, args.prompt_len - 1))

        # -- 4. free-running divergence -----------------------------------
        ctx_q = np.asarray(prompts)
        for _ in range(args.gen_len):
            lg = np.asarray(f_q(jnp.asarray(ctx_q))[:, -1])
            ctx_q = np.concatenate(
                [ctx_q, lg.argmax(-1)[:, None].astype(np.int32)], 1)
        gen_bf = chains[:, args.prompt_len:]
        gen_q = ctx_q[:, args.prompt_len:]
        agree = gen_bf == gen_q
        exact = agree.all(axis=1)
        first_div = np.where(exact, args.gen_len, agree.argmin(axis=1))
        per_mode[mode] = {
            "teacher_forced_data_dist": tf_data,
            "teacher_forced_greedy_chains": tf_chain,
            "free_running": {
                "exact_32tok_match_rate": round(float(exact.mean()), 4),
                "mean_first_divergence_pos": round(float(first_div.mean()), 2),
                "median_first_divergence_pos": float(np.median(first_div)),
            },
        }
        print(mode, "flip", per_mode[mode]["teacher_forced_data_dist"][
            "overall_flip_rate"], "exact32",
            per_mode[mode]["free_running"]["exact_32tok_match_rate"],
            flush=True)

    results = {
        "protocol": "TINY distilled on synthetic two-permutation language; "
                    "each shipped quantization tier (int8w8a headline, int8 "
                    "weight-only, int4 weight-only) vs the bf16 model on "
                    "the SAME prompts: teacher-forced flips bucketed by "
                    "bf16 top1-top2 logit margin + free-running greedy "
                    "divergence",
        "config": {"model": "TINY", "steps": args.steps,
                   "n_prompts": args.n_prompts, "gen_len": args.gen_len},
        "train_ce": {"first": round(loss0, 3), "final": round(loss, 3)},
        "modes": per_mode,
    }
    with open("BENCH_W8A8_PROXY_TINY.json", "w") as fp:
        json.dump(results, fp, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
