"""LM training CLI — reproduces the reference's libreasr-lm.ipynb:
tokenized text corpus -> N-layer LSTM LM -> cross-entropy, reporting
valid loss and perplexity (the reference reports en ppl 35.00 / de 41.30
at bs 768, seq len 64, one-cycle 8 epochs).

Usage:
  python train_lm.py --corpus text.txt --tokenizer tmp/tok.labpe
                     [--steps N] [--bs 768] [--seq-len 64] [--out lm.msgpack]
"""

from __future__ import annotations

import argparse
import os
import time


def batch_stream(ids, bs: int, seq_len: int, seed: int = 0):
    """Random crops of seq_len+1 tokens -> (x, y) next-token pairs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = len(ids) - seq_len - 1
    while True:
        starts = rng.integers(0, n, bs)
        chunk = np.stack([ids[s : s + seq_len + 1] for s in starts])
        yield chunk[:, :-1], chunk[:, 1:]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--tokenizer", default="")
    p.add_argument("--bs", type=int, default=768)
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--embed-sz", type=int, default=768)
    p.add_argument("--hidden-sz", type=int, default=768)
    p.add_argument("--num-layers", type=int, default=4)
    p.add_argument("--out", default="tmp/lm.msgpack")
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--vocab-sz", type=int, default=0,
                   help="pad the LM vocab (0 = tokenizer size); must match "
                        "the ASR model's padded vocab for fusion")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    from libreasr_tpu.data.language import get_language
    from libreasr_tpu.models.lm import LM, LMConfig

    lang, vocab_sz = get_language(model_file=a.tokenizer or None)
    if a.vocab_sz:
        vocab_sz = max(vocab_sz, a.vocab_sz)
    print(f"[lm] vocab={vocab_sz}")

    ids = []
    with open(a.corpus) as f:
        for line in f:
            # sos=True: decode-time fusion conditions the LM on the BOS
            # token first (models/decode.py) — it must be in-distribution
            ids.extend(lang.numericalize(line.strip(), sos=True))
    ids = np.asarray(ids, np.int32)
    n_valid = max(len(ids) // 20, a.seq_len + 2)
    train_ids, valid_ids = ids[:-n_valid], ids[-n_valid:]
    print(f"[lm] corpus tokens: train={len(train_ids)} valid={len(valid_ids)}")

    cfg = LMConfig(
        vocab_sz=vocab_sz, embed_sz=a.embed_sz, hidden_sz=a.hidden_sz,
        num_layers=a.num_layers, p=0.3,
    )
    model = LM(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 4), jnp.int32)
    )
    params = variables["params"]

    schedule = optax.warmup_cosine_decay_schedule(
        a.lr / 25, a.lr, max(a.steps // 10, 1), a.steps
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(schedule))
    opt_state = tx.init(params)

    def loss_fn(params, x, y, rng, train=True):
        logp, _ = model.apply(
            {"params": params}, x, train=train,
            rngs={"dropout": rng} if train else {},
        )
        nll = -jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
        return nll.mean()

    @jax.jit
    def train_step(params, opt_state, x, y, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_loss(params, x, y):
        return loss_fn(params, x, y, jax.random.PRNGKey(0), train=False)

    stream = batch_stream(train_ids, a.bs, a.seq_len)
    v_stream = batch_stream(valid_ids, min(a.bs, 64), a.seq_len, seed=1)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(1, a.steps + 1):
        x, y = next(stream)
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(x), jnp.asarray(y), k
        )
        if step % a.eval_every == 0 or step == a.steps:
            vx, vy = next(v_stream)
            vl = float(eval_loss(params, jnp.asarray(vx), jnp.asarray(vy)))
            print(
                f"[lm] step {step} train_loss={float(loss):.3f} "
                f"valid_loss={vl:.3f} ppl={np.exp(vl):.2f} "
                f"({time.time()-t0:.0f}s)"
            )

    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "wb") as f:
        f.write(serialization.to_bytes({"params": params}))
    print(f"[lm] saved -> {a.out}")


if __name__ == "__main__":
    main()
