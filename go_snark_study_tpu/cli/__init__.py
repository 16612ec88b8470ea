"""go-snark-cli (reference: cli/main.go)."""

from .main import build_parser, main

__all__ = ["build_parser", "main"]
