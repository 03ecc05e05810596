"""Volume comparison CLI (the reference's irtkEvaluation / --evaluation
research harness, SURVEY.md §4.4): prints the joint-histogram metric row
between a reconstruction and a ground-truth/baseline volume."""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="fetalrecon-evaluate",
        description="Histogram metrics between two volumes "
                    "(CC/SSD/JE/MI/NMI/CR/LC/Kappa/PSNR)")
    p.add_argument("target", help="Target volume (NIfTI)")
    p.add_argument("source", help="Source volume (NIfTI)")
    p.add_argument("--json", action="store_true",
                   help="Emit one JSON object instead of the text row")
    args = p.parse_args(argv)

    from ..evaluation.metrics import evaluate
    from ..io.nifti import read_nifti

    r = evaluate(read_nifti(args.target), read_nifti(args.source))
    if args.json:
        print(json.dumps(r.as_dict()))
    else:
        # the reference's output row (irtkEvaluation.cpp:247-258)
        print(f"CC: {r.cc}")
        print(f"SSD: {r.ssd}")
        print(f"JE: {r.je}")
        print(f"MI: {r.mi}")
        print(f"NMI: {r.nmi}")
        print(f"CR_X|Y: {r.cr_xy}")
        print(f"CR_Y|X: {r.cr_yx}")
        print(f"LC: {r.lc}")
        print(f"KS: {r.ks}")
        print(f"PSNR: {r.psnr}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
