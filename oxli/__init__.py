"""Single entry point script for khmer-tpu.

Parity: reference oxli/__init__.py — the `oxli` subcommand CLI.
"""

import argparse
import sys

from khmer_tpu.khmer_args import build_nodegraph_args
from oxli import build_graph


def get_parser():
    """Return the parser object for the oxli subcommand handler."""
    parser = argparse.ArgumentParser(
        description='Single entry point script for khmer',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)

    subparsers = parser.add_subparsers()

    # build-graph (formerly load-graph.py)
    parser_build_graph = subparsers.add_parser(
        name='build-graph',
        help="Load sequences into the compressible graph format "
        "plus optional tagset")
    parser_build_graph = build_nodegraph_args(parser=parser_build_graph)
    build_graph.build_parser(parser_build_graph)
    parser_build_graph.set_defaults(func=build_graph.main)

    return parser


def main():
    """Parse the command line and kick off the subcommand."""
    if len(sys.argv) < 2:
        args = get_parser().parse_args(['--help'])
    else:
        args = get_parser().parse_args()
    args.func(args)


if __name__ == '__main__':
    main()
