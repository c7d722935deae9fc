"""Monocular depth shell-out for the depth-supervised variant.

The reference shells out to an external MiDaS checkout
(/root/reference/apps/calibration/run_midas.py + docs/external/run_midas.py);
the interface contract is the directory of grayscale 16-bit PNGs at
``<root>/depth/<scale>/...``. This wrapper invokes whatever depth tool is
configured via --cmd (MiDaS itself is not bundled).
"""
from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="cached image dir")
    parser.add_argument("--output", required=True, help="depth output dir")
    parser.add_argument(
        "--cmd",
        default=(
            "python run.py --model_type dpt_beit_large_512 "
            "--input_path {input} --output_path {output} --grayscale"
        ),
        help="depth-tool command template with {input}/{output} slots",
    )
    args = parser.parse_args()
    os.makedirs(args.output, exist_ok=True)
    cmd = args.cmd.format(input=args.input, output=args.output)
    print(cmd)
    os.system(cmd)


if __name__ == "__main__":
    main()
