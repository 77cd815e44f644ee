"""VAE latent-cache fill batch-size sweep (BASELINE.json metric 2).

The bench's cache-fill stage runs bs=8 @512 (bench.py _bench_vae_cache).
The encode is almost pure conv — larger batches should fill the MXU
better until HBM runs out. One point per invocation (fresh process per
point, experiments/ convention):

    python experiments/exp_vae_cache_bs.py <batch_size> [res]

Appends a JSON line to experiments/sweep_log.txt.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import os
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from onetrainer_tpu.models.vae import AutoencoderKL, sd15_vae_config

    cfg = sd15_vae_config(dtype=jnp.bfloat16)
    vae = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(0)
    probe = jax.random.uniform(
        jax.random.PRNGKey(1), (1, res, res, 3), jnp.bfloat16, -1.0, 1.0)
    params = jax.jit(vae.init)(rng, probe, jax.random.PRNGKey(2))["params"]
    pixels = jax.random.uniform(
        jax.random.PRNGKey(1), (bs, res, res, 3), jnp.bfloat16, -1.0, 1.0)

    @jax.jit
    def encode(pixels):
        return vae.apply({"params": params}, pixels, method=vae.encode)

    mean, _ = encode(pixels)
    mean.block_until_ready()
    n = max(200 // bs, 10)
    start = time.perf_counter()
    for _ in range(n):
        mean, _ = encode(pixels)
    mean.block_until_ready()
    elapsed = time.perf_counter() - start
    row = {"exp": "vae_cache_bs", "bs": bs, "res": res,
           "imgs_per_sec": round(bs * n / elapsed, 2),
           "device": str(jax.devices()[0])}
    print(json.dumps(row))
    with open("/root/repo/experiments/sweep_log.txt", "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
