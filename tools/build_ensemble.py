#!/usr/bin/env python
"""Merge several model bundles sharing one embedder into a multi-head
ensemble bundle: one corpus pass scores every member's classes.

    python tools/build_ensemble.py models/model_a models/model_b \
        --out models/ab_ensemble

See buzzdetect_tpu.models.convert.build_ensemble_bundle for semantics
(identical embedder weights required; classes prefixed <member>.<class>).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('members', nargs='+',
                    help='member bundle directories (>= 2)')
    ap.add_argument('--out', required=True, help='output bundle directory')
    args = ap.parse_args()

    from buzzdetect_tpu.models.convert import build_ensemble_bundle
    _, config = build_ensemble_bundle(args.members, args.out)
    print(f'wrote ensemble bundle {args.out}: '
          f'{len(config["classes"])} classes '
          f'({config["provenance"]})')


if __name__ == '__main__':
    main()
