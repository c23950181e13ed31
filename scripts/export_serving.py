"""Export a trained experiment as a StableHLO serving artifact.

Usage:
  python scripts/export_serving.py --dataset ImageNet --base_network \
      bcosification --experiment_name resnet_50 --reload last \
      --out /tmp/rn50.stablehlo [--explain] [--ema] [--input_size 224]

The artifact embeds the weights; load it anywhere with
``bcosification_tpu.serving.load_serialized(blob).call(x)`` — no model code
needed at inference time. ``--explain`` exports the fused fwd+explain step
(logits, selected class, dynamic-linear W(x)) instead of the plain forward.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="ImageNet")
    p.add_argument("--base_network", default="bcosification")
    p.add_argument("--experiment_name", required=True)
    p.add_argument("--base_directory", default=None)
    p.add_argument("--reload", default="last")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--explain", action="store_true")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--channels", type=int, default=6)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from bcosification_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # BCOS_PLATFORM={cpu,tpu,auto} honoured (CLAUDE.md)

    if args.base_directory:
        os.environ["BCOS_EXPERIMENT_ROOT"] = args.base_directory

    from bcosification_tpu import serving
    from bcosification_tpu.experiments.utils.experiment_utils import Experiment

    exp = Experiment(args.dataset, args.base_network, args.experiment_name)
    model, variables = exp.load_trained_model(reload=args.reload, ema=args.ema)
    export = serving.export_explain if args.explain else serving.export_forward
    blob = export(
        model, variables, input_size=args.input_size, channels=args.channels
    )
    with open(args.out, "wb") as f:
        f.write(bytes(blob))
    print(f"wrote {args.out}: {len(blob)/1e6:.1f} MB "
          f"({'fwd+explain' if args.explain else 'forward'}, "
          f"input {args.input_size}x{args.input_size}x{args.channels})")


if __name__ == "__main__":
    main()
