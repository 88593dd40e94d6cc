"""Signature introspection: single source of truth for configs and CLIs.

``get_func_spec`` turns a callable's type-hinted ``__init__`` signature into
an argparse option spec; the same spec generates the default YAML config
schemas. This reproduces the reference's introspection-driven config system
(reference: brever/inspect.py:32-143), including the ``Parse``/``NoParse``
typing markers, comma-split container actions, and the ``_is_submodel``
inheritance merge used by model subclasses.
"""

import argparse
import inspect as _inspect
from types import UnionType
from typing import Generic, TypeVar, Union, get_args, get_origin

T = TypeVar('T')


class NoParse(Generic[T]):
    """Typing marker: exclude this argument from CLI/config generation."""


class Parse(Generic[T]):
    """Typing marker: in a union, parse CLI input as the wrapped type."""


class Path:
    """String normalizer for filesystem paths (forward slashes, no
    trailing slash)."""

    def __new__(cls, s):
        return s.replace('\\', '/').rstrip('/')


class Bool:
    """argparse-friendly bool parser accepting true/false/yes/no/1/0."""

    def __new__(cls, s):
        lowered = s.lower()
        if lowered in ('true', 'yes', '1'):
            return True
        if lowered in ('false', 'no', '0'):
            return False
        raise argparse.ArgumentTypeError(f'expected bool value, got {s}')


class OriginAction:
    """Factory for argparse actions that comma-split container arguments.

    ``--foo a,b,c`` with origin ``set`` and item type ``str`` yields
    ``{'a', 'b', 'c'}``.
    """

    def __init__(self, origin, item_type):
        self.origin = origin
        self.item_type = item_type

    def __call__(factory, *args, **kwargs):

        class SplitAction(argparse.Action):
            def __call__(self, parser, namespace, values, option_string=None):
                items = [factory.item_type(v)
                         for v in values.split(',') if v != '']
                setattr(namespace, self.dest, factory.origin(items))

        return SplitAction(*args, **kwargs)


_SCALARS = (str, int, float, bool, Path)


def get_func_spec(func):
    """Build ``{arg: {type, action, default, required}}`` from type hints.

    Raises on missing hints, unsupported types, ambiguous unions, or
    defaults that don't match their annotation — the same contract the
    reference enforces so config schemas can't silently drift.
    """
    spec = _inspect.getfullargspec(func)
    defaults = {}
    if spec.defaults:
        defaults = dict(zip(reversed(spec.args), reversed(spec.defaults)))

    out = {}
    for arg in spec.args:
        if arg in ('self', 'return'):
            continue
        if arg not in spec.annotations:
            raise ValueError(f'missing type hint for argument {arg}')
        hint = spec.annotations[arg]
        default = defaults.get(arg)

        entry = _resolve_hint(arg, hint, default)
        if entry is None:  # NoParse
            continue
        entry['default'] = default
        entry['required'] = arg not in defaults
        out[arg] = entry

    # model subclasses merge their parent's spec underneath their own
    if getattr(func, '_is_submodel', False):
        merged = get_func_spec(func.__bases__[0])
        merged.update(out)
        out = merged

    return out


def _resolve_hint(arg, hint, default):
    def bad_typing():
        raise ValueError(f'unsupported typing for argument {arg}, got {hint}')

    def bad_default():
        raise ValueError(f'default value of argument {arg} does not match '
                         f'typing, got {default} and {hint}')

    def ambiguous():
        raise ValueError(f'ambiguous union typing for argument {arg}, got '
                         f'{hint}; use Parse or NoParse to avoid ambiguity')

    origin = get_origin(hint)
    action = None
    resolved = hint

    if origin is None:
        if default is not None and not isinstance(default, hint):
            bad_default()
    elif origin is NoParse:
        return None
    elif origin in (list, set, tuple):
        item_types = get_args(hint)
        if origin is tuple:
            if any(t != item_types[0] for t in item_types):
                bad_typing()
            if default is not None and len(default) != len(item_types):
                bad_default()
        elif len(item_types) != 1:
            bad_typing()
        if default is not None:
            if not isinstance(default, origin):
                bad_default()
            if not all(isinstance(d, item_types[0]) for d in default):
                bad_default()
        resolved = str
        action = OriginAction(origin, item_types[0])
    elif origin in (Union, UnionType):
        parse_args = [t for t in get_args(hint) if get_origin(t) is Parse]
        plain_args = [t for t in get_args(hint)
                      if get_origin(t) not in (Parse, NoParse)]
        if len(parse_args) > 1:
            ambiguous()
        elif len(parse_args) == 1:
            resolved, = get_args(parse_args[0])
        elif len(plain_args) > 1:
            ambiguous()
        elif len(plain_args) == 1:
            resolved, = get_args(plain_args[0])
        else:
            bad_typing()
        if default is not None and not isinstance(default, resolved):
            bad_default()
    else:
        bad_typing()

    if action is None and resolved not in _SCALARS:
        bad_typing()

    if resolved is bool:
        resolved = Bool

    return dict(type=resolved, action=action)
