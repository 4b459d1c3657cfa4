"""Property test: ``glob_to_regex`` equals an independent pure-Python
matcher implementing the documented globset-default semantics directly
(no regex) — on globs salted with regex METACHARACTERS.

This is an authorization surface (``ops/globs.py`` gates permission
visibility AND watch subscriptions): an unescaped ``.`` / ``(`` / ``[``
leaking into the compiled regex, or a lost ``^``/``$`` anchor, silently
WIDENS visibility. The model interprets the dialect spec one token at a
time (leading ``**/`` = zero-or-more leading components, trailing
``/**`` = strictly inside the directory, interior ``**`` ≡ ``*`` =
any chars including ``/``, ``?`` = any one char, everything else a
literal) and never touches ``re``.
"""

from __future__ import annotations

import re
from functools import lru_cache

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aruna_spark.ops.globs import glob_to_regex

# alphabet salts globs and paths with regex metacharacters on purpose
_CHARS = ["a", "b", "/", ".", "(", "[", "+", "|", "$", "\\"]
_GLOB_ATOMS = _CHARS + ["*", "?", "**", "**/", "/**"]

glob_s = st.lists(st.sampled_from(_GLOB_ATOMS), max_size=8).map("".join)
path_s = st.lists(st.sampled_from(_CHARS), max_size=8).map("".join)


def _tokens(glob: str):
    i, out = 0, []
    while i < len(glob):
        if glob[i : i + 3] == "**/" and i == 0:
            out.append(("lead",))
            i += 3
        elif glob[i : i + 3] == "/**" and i + 3 == len(glob):
            out.append(("trail",))
            i += 3
        elif glob[i : i + 2] == "**":
            out.append(("star",))
            i += 2
        elif glob[i] == "*":
            out.append(("star",))
            i += 1
        elif glob[i] == "?":
            out.append(("any1",))
            i += 1
        else:
            out.append(("lit", glob[i]))
            i += 1
    return tuple(out)


def model_match(glob: str, path: str) -> bool:
    toks = _tokens(glob)

    @lru_cache(maxsize=None)
    def go(ti: int, pi: int) -> bool:
        if ti == len(toks):
            return pi == len(path)
        t = toks[ti]
        if t[0] == "lit":
            return pi < len(path) and path[pi] == t[1] and go(ti + 1, pi + 1)
        if t[0] == "any1":
            return pi < len(path) and go(ti + 1, pi + 1)
        if t[0] == "star":
            return any(go(ti + 1, k) for k in range(pi, len(path) + 1))
        if t[0] == "lead":
            # zero-or-more LEADING components: resume at start or just
            # after any '/' in the consumed prefix
            if go(ti + 1, pi):
                return True
            return any(
                path[k] == "/" and go(ti + 1, k + 1)
                for k in range(pi, len(path))
            )
        if t[0] == "trail":
            # strictly inside the directory: a '/' then anything
            return pi < len(path) and path[pi] == "/"
        raise AssertionError(t)

    return go(0, 0)


@given(glob=glob_s, path=path_s)
@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_glob_regex_equals_direct_model(glob, path):
    got = re.match(glob_to_regex(glob), path) is not None
    assert got == model_match(glob, path), (glob, path, glob_to_regex(glob))
