#!/usr/bin/env python
"""One-shot refactoring script: split the 11.6k-line queries.py into a
queries/ package (round-8 verdict directive #7). Pure file move — the
registry, every query function, and every oracle string stay
byte-identical in behavior; modules import shared names from _core and
earlier domain modules explicitly.

Run once: python tools/split_queries.py
"""
from __future__ import annotations

import ast
import builtins
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "google_sheets_etl_spark", "queries.py")
PKG = os.path.join(ROOT, "google_sheets_etl_spark", "queries")

# (module_name, first_line) — each module runs to the next boundary
BOUNDARIES = [
    ("_core", 1),
    ("reference_ops", 256),
    ("relational", 1076),
    ("events", 2103),
    ("dedup_q", 2311),
    ("ann_q", 2802),
    ("text_q", 4176),
    ("media_q", 4430),
    ("semantic_q", 6249),
    ("analytics_q", 7018),
    ("typed_q", 8313),
    ("training_q", 9080),
    ("tokenizer_q", 10156),
    ("tail_q", 10978),
]
REORDER_START = 11548  # _reorder_for_driver_coverage def + call -> __init__


def main() -> None:
    src = open(SRC).read()
    lines = src.split("\n")
    tree = ast.parse(src)

    # top-level name definitions per line range
    def node_span(n):
        start = min([n.lineno] + [d.lineno for d in
                                  getattr(n, "decorator_list", [])])
        return start, n.end_lineno

    def defined_names(n):
        out = []
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                          ast.ClassDef)):
            out.append(n.name)
        elif isinstance(n, ast.Assign):
            for t in n.targets:
                if isinstance(t, ast.Name):
                    out.append(t.id)
        elif isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
            out.append(n.target.id)
        elif isinstance(n, (ast.Import, ast.ImportFrom)):
            for a in n.names:
                out.append((a.asname or a.name).split(".")[0])
        return out

    mod_of_line = {}
    for i, (name, start) in enumerate(BOUNDARIES):
        end = (BOUNDARIES[i + 1][1] - 1 if i + 1 < len(BOUNDARIES)
               else REORDER_START - 1)
        for ln in range(start, end + 1):
            mod_of_line[ln] = name

    mod_defs: dict[str, set] = {m: set() for m, _ in BOUNDARIES}
    mod_nodes: dict[str, list] = {m: [] for m, _ in BOUNDARIES}
    reorder_nodes = []
    for n in tree.body:
        s, e = node_span(n)
        if s >= REORDER_START:
            reorder_nodes.append(n)
            continue
        m = mod_of_line[s]
        mod_nodes[m].append(n)
        mod_defs[m].update(defined_names(n))

    order = [m for m, _ in BOUNDARIES]

    def used_names(nodes) -> set:
        used = set()
        for n in nodes:
            for sub in ast.walk(n):
                if isinstance(sub, ast.Name) and isinstance(
                    sub.ctx, ast.Load
                ):
                    used.add(sub.id)
        return used

    bi = set(dir(builtins))
    core_defs = mod_defs["_core"]

    # compute backward imports per module; flag forward refs
    backward: dict[str, dict[str, list]] = {}
    for mi, m in enumerate(order):
        if m == "_core":
            continue
        need = used_names(mod_nodes[m]) - mod_defs[m] - core_defs - bi
        imports: dict[str, list] = {}
        for name in sorted(need):
            found = None
            for mj, other in enumerate(order):
                if other in (m, "_core") and other != "_core":
                    continue
                if name in mod_defs[other]:
                    found = (mj, other)
                    break
            if found is None:
                print(f"WARN {m}: unresolved name {name!r}")
                continue
            mj, other = found
            if other == "_core":
                continue  # wildcard covers it
            if mj > mi:
                print(f"FORWARD REF {m} -> {other}: {name}")
            imports.setdefault(other, []).append(name)
        backward[m] = imports

    os.makedirs(PKG, exist_ok=True)

    def fix_relative(text: str) -> str:
        text = re.sub(r"from \.(?!\.)", "from ..", text)
        # package modules live one directory deeper than queries.py
        # did — every __file__-relative repo/fixtures path gains a
        # level
        text = text.replace(
            "os.path.dirname(os.path.dirname(os.path.abspath(__file__)))",
            "os.path.dirname(os.path.dirname(os.path.dirname("
            "os.path.abspath(__file__))))",
        )
        text = text.replace(
            '__import__("os").path.dirname('
            '__import__("os").path.abspath(__file__)),\n    "..", "fixtures",',
            '__import__("os").path.dirname(__import__("os").path.dirname('
            '__import__("os").path.abspath(__file__))),\n'
            '    "..", "fixtures",',
        )
        text = text.replace(
            'os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")',
            'os.path.join(os.path.dirname(os.path.abspath(__file__)), '
            '"..", "..")',
        )
        return text

    def slice_lines(a: int, b: int) -> str:
        return "\n".join(lines[a - 1 : b])

    # _core: original preamble + repo-root fixtures constant fix note
    core_text = fix_relative(slice_lines(1, BOUNDARIES[1][1] - 1))
    with open(os.path.join(PKG, "_core.py"), "w") as f:
        f.write(core_text.rstrip() + "\n")

    for i in range(1, len(BOUNDARIES)):
        m, start = BOUNDARIES[i]
        end = (BOUNDARIES[i + 1][1] - 1 if i + 1 < len(BOUNDARIES)
               else REORDER_START - 1)
        body = fix_relative(slice_lines(start, end))
        hdr = [
            f'"""Query registry — {m} section (split from the former',
            "queries.py; see queries/__init__.py for the package map",
            'and _core for shared helpers)."""',
            "",
            "from ._core import *  # noqa: F401,F403 — shared registry/helpers",
        ]
        for other, names in sorted(backward.get(m, {}).items()):
            line = f"from .{other} import " + ", ".join(sorted(names))
            hdr.append(line + "  # noqa: E501")
        with open(os.path.join(PKG, f"{m}.py"), "w") as f:
            f.write("\n".join(hdr) + "\n\n" + body.rstrip() + "\n")

    reorder_text = fix_relative(
        "\n".join(
            slice_lines(*node_span(n)) for n in reorder_nodes
        )
    )
    init = [
        '"""Driver-contract query inventory — the queries/ package',
        "(split from the former 11.6k-line queries.py, round-8 verdict",
        "directive #7: pure file move, registry and oracles unchanged).",
        "",
        "Import order below IS registration order; the",
        "_reorder_for_driver_coverage post-pass then re-sorts the",
        'registry for the driver\'s bounded per-round budget."""',
        "",
        "from ._core import *  # noqa: F401,F403",
        "from ._core import _TS_UNIT_CACHE  # noqa: F401 — test surface",
    ]
    for m, _ in BOUNDARIES[1:]:
        init.append(f"from .{m} import *  # noqa: F401,F403")
    init.append("")
    init.append(reorder_text.rstrip())
    init.append("")
    with open(os.path.join(PKG, "__init__.py"), "w") as f:
        f.write("\n".join(init))

    os.remove(SRC)
    print("split complete")


if __name__ == "__main__":
    main()
