"""Convert a reference PyTorch checkpoint into a navc_tpu checkpoint.

Lets a user of the upstream repo bring their trained ``.pth.tar`` models
(torch.save({'state_dict', 'settings', ...}) — reference misc/utils.py:195-202)
straight onto TPU:

    python -m navc_tpu.cli.convert best.pth.tar best.ckpt

The resolved reference opt embedded in the checkpoint becomes the navc
Config; the converted parameter tree is validated leaf-by-leaf against a
fresh ``init_params`` template (same paths + shapes) before saving, so a
silent layout mismatch cannot produce a loadable-but-wrong checkpoint.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="reference .pth.tar checkpoint")
    ap.add_argument("dst", help="output navc .ckpt path")
    args = ap.parse_args(argv)

    import jax

    # conversion is pure host work; never touch an accelerator for it
    jax.config.update("jax_platforms", "cpu")

    import torch

    from ..config import Config
    from ..models import build_model, init_params
    from ..runtime.checkpoint import save_checkpoint
    from ..runtime.torch_convert import convert_state_dict, validate_against

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    if "state_dict" not in ckpt or "settings" not in ckpt:
        sys.exit("not a reference checkpoint: expected torch.save("
                 "{'state_dict', 'settings', ...}) (misc/utils.py:195-202)")
    opt = dict(ckpt["settings"])
    cfg = Config.from_dict(opt)

    aux = [c for c in cfg.crit if c.lower() != "lang"]
    variables = convert_state_dict(ckpt["state_dict"], aux_crits=aux,
                                   tie_weights=cfg.tie_weights)
    template = init_params(build_model(cfg), jax.random.PRNGKey(0), cfg)
    validate_against(variables, template)

    out = {
        "epoch": ckpt.get("epoch", 0),
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats") or {},
        "opt_state": None,
        "validate_result": ckpt.get("validate_result", {}),
        "settings": cfg,
    }
    save_checkpoint(out, os.path.dirname(os.path.abspath(args.dst)) or ".",
                    os.path.basename(args.dst))
    n_leaves = len(jax.tree_util.tree_leaves(variables))
    print("converted %s -> %s (%d parameter leaves, method=%s, vocab=%d)"
          % (args.src, args.dst, n_leaves, cfg.method or cfg.decoding_type,
             cfg.vocab_size))


if __name__ == "__main__":
    main()
