"""Config system and misc utilities."""

from .config import Config, compose, deep_merge, load_yaml, parse_overrides

__all__ = ["Config", "compose", "deep_merge", "load_yaml", "parse_overrides"]
