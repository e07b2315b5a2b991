"""Dump the compiled (post-layout) HLO text of a model forward / train step.

Usage: python tools/dump_hlo.py [model] [out_path]        # eval forward
       python tools/dump_hlo.py train [model] [out_path]  # fwd+bwd+adamw
Writes the full optimized HLO to out_path (default /tmp/<model>_hlo.txt or
/tmp/<model>_train_hlo.txt). Greppable for the exact ops the device trace
names (copies, relayouts, anonymous `fusion.NNNN`s) — the fused_computation
bodies attribute each fusion, and the layout annotations identify which
consumer forced a copy.
"""
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main(model="camliraft", out_path=None):
    from measure_model import build

    out_path = out_path or f"/tmp/{model}_hlo.txt"
    forward, variables, inputs = build(model)  # forward is already jitted
    compiled = forward.lower(variables, inputs).compile()
    _write(compiled, out_path)


def main_train(model="camliraft", out_path=None):
    from measure_model import build_train

    out_path = out_path or f"/tmp/{model}_train_hlo.txt"
    train_step, state, batch, _ = build_train(model)
    compiled = train_step.lower(state, batch).compile()  # already jitted
    _write(compiled, out_path)


def _write(compiled, out_path):
    text = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(text)
    print(f"wrote {len(text) / 1e6:.1f} MB to {out_path}")


if __name__ == "__main__":
    args = sys.argv[1:]
    if args[:1] == ["train"]:
        main_train(*args[1:])
    else:
        main(*args)
