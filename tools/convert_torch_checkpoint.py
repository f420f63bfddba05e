"""Convert a reference torch checkpoint into this framework's format.

    python tools/convert_torch_checkpoint.py \
        --torch_model /path/to/model_00000600.pt \
        --config configurations/craniofacial.yaml \
        --out outputs/imported/checkpoints \
        [--torch_mlp /path/to/mlp_classifier.pt] \
        [--torch_opt /path/to/optimizer.pt] [--epoch 600] [--reverse]

Forward mode writes ``model_%08d.ckpt`` (msgpack, training/checkpoint.py
layout) into --out, ready for ``train.py --resume`` / ``test.py``. With
--torch_opt the reference's Adam moments convert into optimizer.ckpt
(exact mid-training continuation); without it Adam starts fresh, exactly
like the reference when only net weights are present.

--reverse converts OUR latest checkpoint in --out back into a
reference-named ``torch.save({'model': ...})`` at --torch_model, loadable
by the reference's ``Model.load_state_dict`` (model_manager.py:690-696).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_model", required=True,
                        help="reference model_*.pt (input, or output "
                             "with --reverse)")
    parser.add_argument("--config", required=True,
                        help="yaml config describing the architecture")
    parser.add_argument("--out", required=True,
                        help="checkpoint dir (output, or input with "
                             "--reverse)")
    parser.add_argument("--torch_mlp", default=None,
                        help="optional reference mlp_classifier.pt to "
                             "import as the end2end head")
    parser.add_argument("--torch_opt", default=None,
                        help="optional reference optimizer.pt — converts "
                             "the Adam moments too, for exact mid-training "
                             "continuation")
    parser.add_argument("--epoch", type=int, default=None,
                        help="epoch stamped into the output filename "
                             "(default: parsed from the torch filename, "
                             "else 0)")
    parser.add_argument("--reverse", action="store_true",
                        help="our checkpoint → reference torch format")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")   # pure host conversion

    from flax import serialization

    from craniofacialsd_vae_tpu.models import SDVAEConfig
    from craniofacialsd_vae_tpu.training import (export_reference_checkpoint,
                                                 import_reference_checkpoint,
                                                 import_reference_mlp)
    from craniofacialsd_vae_tpu.training.checkpoint import (_atomic_write,
                                                            latest_checkpoint)
    from craniofacialsd_vae_tpu.utils import get_config

    cfg = get_config(args.config)
    config = SDVAEConfig.from_dict(cfg["model"],
                                   cfg["optimization"]["kl_weight"])

    if args.reverse:
        path = latest_checkpoint(args.out)
        if path is None:
            raise SystemExit(f"no model_*.ckpt under {args.out}")
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        export_reference_checkpoint(raw["params"], config,
                                    args.torch_model)
        msg = f"{path} → {args.torch_model} (reference torch format)"
        opt_ckpt = os.path.join(args.out, "optimizer.ckpt")
        if os.path.exists(opt_ckpt):
            from craniofacialsd_vae_tpu.training import (
                coupled_adam, export_reference_optimizer)
            lr = float(cfg["optimization"]["lr"])
            wd = float(cfg["optimization"]["weight_decay"])
            optimizer = coupled_adam(lr, wd)
            with open(opt_ckpt, "rb") as f:
                raw_opt = serialization.msgpack_restore(f.read())
            template = optimizer.init(raw["params"])
            opt_state = serialization.from_state_dict(
                template, raw_opt["opt_state"])
            opt_out = os.path.splitext(args.torch_model)[0] \
                + "_optimizer.pt"
            export_reference_optimizer(opt_state, config, opt_out, lr, wd)
            msg += f" + {opt_out}"
        print(msg)
        return

    params = import_reference_checkpoint(args.torch_model, config)
    clf_params = (import_reference_mlp(args.torch_mlp)
                  if args.torch_mlp else None)
    opt_state = None
    if args.torch_opt:
        from craniofacialsd_vae_tpu.training import (coupled_adam,
                                                     import_reference_optimizer)
        optimizer = coupled_adam(float(cfg["optimization"]["lr"]),
                                 float(cfg["optimization"]["weight_decay"]))
        opt_state = import_reference_optimizer(args.torch_opt, params,
                                               config, optimizer)

    epoch = args.epoch
    if epoch is None:
        import re
        m = re.search(r"model_(\d+)\.pt$",
                      os.path.basename(args.torch_model))
        epoch = int(m.group(1)) if m else 0
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, f"model_{epoch:08d}.ckpt")
    _atomic_write(out_path, serialization.to_bytes(
        {"params": params, "clf_params": clf_params}))
    if opt_state is not None:
        _atomic_write(os.path.join(args.out, "optimizer.ckpt"),
                      serialization.to_bytes(
                          {"opt_state": opt_state, "clf_opt_state": None,
                           "epoch": epoch}))
    print(f"{args.torch_model} → {out_path}"
          + (f" (+ MLP head from {args.torch_mlp})" if args.torch_mlp
             else "")
          + (" (+ Adam moments from optimizer.pt)" if opt_state is not None
             else ""))


if __name__ == "__main__":
    main()
