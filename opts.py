"""CLI-compatible flag surface (see auformer/core/config.py).

``python train.py -t AU -mn avformer ...`` works with the reference's exact
flags; parse_opt returns an argparse.Namespace like the reference, while
auformer internals consume the typed Config.
"""
from auformer.core.config import build_parser, parse_opt as parse_config


def parse_opt(argv=None):
    return build_parser().parse_args(argv)
