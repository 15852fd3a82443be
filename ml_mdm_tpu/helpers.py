"""Small shared helpers (reference helpers.py)."""
import logging
import sys


def print_args(args):
    command_str = f"python {sys.argv[0]} "
    for k, v in vars(args).items():
        command_str += f"\\\n\t {k}={v}"
    logging.info(command_str)
