"""Ablate the clip/alpha 4K walk (BASELINE config 5 "as written").

The round-3 sweep put the float path at 59.2 FPS — a hair under the
60 FPS target.  This isolates where the frame time goes:

- ``full``        — the 101-command per-instance walk (what run_configs
                    measures),
- ``instanced``   — the 11-command instanced form,
- ``no_prologue`` — the same renderer config (clip/alpha compiled IN)
                    but only the 92 showcase commands: isolates the cost
                    of the 9 full-screen prologue/epilogue units,
- ``plain``       — plain Configuration (clip/alpha compiled OUT), the
                    92 showcase commands: the config-5 headline row.

Usage: python benchmarks/profile_clipalpha.py [--frames N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def timed(frame, n):
    import jax.numpy as jnp

    _, acc = frame(0, jnp.float32(0.0))
    _, acc = frame(1, acc)
    float(acc)
    best = 0.0
    for b in range(3):
        start = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(n):
            _, acc = frame(b * n + i + 1, acc)
        assert np.isfinite(float(acc))
        best = max(best, n / (time.perf_counter() - start))
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=16)
    parser.add_argument(
        "--variants", default="full,instanced,no_prologue,plain"
    )
    args = parser.parse_args()
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_cache_bench_configs"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    from contrast_renderer_tpu.models import showcase
    from contrast_renderer_tpu.renderer import Configuration, Renderer

    width, height = 3840, 2160
    shape = showcase.build_shape(with_text=True)

    def run(label, commands, config):
        renderer = Renderer(config, width, height)

        def frame(i, acc):
            shape.set_dynamic_stroke_options(
                0, showcase.dashed_options(i * 0.032)
            )
            return renderer.render(commands, to_host=False, carry=acc)

        fps = timed(frame, args.frames)
        print(json.dumps({
            "metric": f"clipalpha_4k_{label}",
            "value": round(fps, 2),
            "unit": "frames/s",
            "commands": len(commands),
        }), flush=True)

    ca_config = Configuration(alpha_layer_count=1, blending="front_to_back")
    wanted = set(args.variants.split(","))
    if "full" in wanted:
        run("full",
            showcase.showcase_commands_clip_alpha(shape, width, height),
            ca_config)
    if "instanced" in wanted:
        run("instanced",
            showcase.showcase_commands_clip_alpha(
                shape, width, height, instanced=True
            ),
            ca_config)
    if "no_prologue" in wanted:
        # Same kernel spec family (clip/alpha compiled in via the
        # config) but only the showcase body: prologue cost by
        # difference.  The clip depth stays 0 so content still renders.
        cmds = showcase.showcase_commands(shape, width, height)
        run("no_prologue", cmds, ca_config)
    if "plain" in wanted:
        run("plain",
            showcase.showcase_commands(shape, width, height),
            Configuration())


if __name__ == "__main__":
    main()
