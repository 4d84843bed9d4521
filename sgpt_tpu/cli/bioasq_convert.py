"""BioASQ → BEIR conversion driver (the reference's preprocessing notebook,
crossencoder/beir/crossencoder_bioasq_bm25.ipynb cells 4-6, as one command):

    python -m sgpt_tpu.cli.bioasq_convert \
        --allmesh allMeSH_2020/allMeSH_2020.json \
        --questions Task8BGoldenEnriched/Task8BGoldenEnriched \
        --out datasets/bioasq [--manual-fixes manual-fixes.csv]

Then: bm25_retriever --dataset bioasq, sgptce --dataset bioasq --bm25results …
"""
from __future__ import annotations

import argparse

from .common import setup_logging


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--allmesh", required=True,
                   help="allMeSH_2020.json (one article per line)")
    p.add_argument("--questions", required=True,
                   help="golden-test directory (BEIR's 500-query split) or "
                        "training8b.json")
    p.add_argument("--out", required=True, help="output BEIR dataset dir")
    p.add_argument("--manual-fixes", default=None, dest="manual_fixes",
                   help="BEIR authors' manual-fixes.csv (ID,TITLE,TEXT)")
    return p.parse_args()


def main(args=None):
    setup_logging()
    args = args or parse_args()
    from ..data.bioasq import convert
    convert(args.allmesh, args.questions, args.out,
            manual_fixes_csv=args.manual_fixes)


if __name__ == "__main__":
    main()
