"""SQL transformation templates: ``{{name.variant}}`` → ``source_N``.

Reference behavior (provider/spark.go:1010-1125 + runner
offline_store_spark_runner.py:876-886): each distinct ref binds to a temp
view ``source_i`` in first-appearance order; unresolved ``{{`` after
substitution is an error.
"""

from __future__ import annotations

import re

_REF_RE = re.compile(r"\{\{\s*([A-Za-z0-9_\-]+)(?:\.([A-Za-z0-9_\-]+))?\s*\}\}")


def template_refs(sql: str) -> list[str]:
    """Distinct ``name.variant`` refs in first-appearance order."""
    seen: list[str] = []
    for m in _REF_RE.finditer(sql):
        ref = f"{m.group(1)}.{m.group(2) or 'default'}"
        if ref not in seen:
            seen.append(ref)
    return seen


def substitute_template(sql: str, bindings: dict[str, str] | None = None) -> tuple[str, list[str]]:
    """Replace refs with view names; return (sql, refs-in-order).

    ``bindings`` maps ``name.variant`` → view name; defaults to
    ``source_0..N`` in first-appearance order (the runner's convention).
    """
    refs = template_refs(sql)
    if bindings is None:
        bindings = {ref: f"source_{i}" for i, ref in enumerate(refs)}

    def repl(m: re.Match) -> str:
        ref = f"{m.group(1)}.{m.group(2) or 'default'}"
        return bindings[ref]

    out = _REF_RE.sub(repl, sql)
    if "{{" in out:
        raise ValueError(f"unresolved template refs remain in: {out!r}")
    return out, refs
