"""Validate-mode text rendering: horizontal/vertical diff tables.

Reference semantics: internal/db/postgres/cmd/validate_utils/
text_document.go:46-326 — the UX layer users actually see when running
``validate``:

- title line ``\\n\\n\\t"schema"."table"``;
- **horizontal** format: one table; with diff each record renders TWO rows
  (original above transformed) sharing a merged ``%LineNum%`` cell;
  changed cells color the original green and the transformed red; without
  diff only the transformed row renders, changed cells red;
- **vertical** format: one output row per (record, column):
  ``%LineNum% | Column | OriginalValue | TransformedValue`` — changed
  columns get a red-background column cell; 3 columns without diff;
- columns that changed but were NOT declared affected are flagged
  ``col (!!!)`` in the header/column cell (text_document.go:243-249);
  affected column headers get a red background;
- cell values wrap at 64 characters (maxWrapLength).

Pure driver-side string formatting over a SMALL collected sample — the
distributed part (the diff itself) is ``diff.diff_report``; rendering a
human-readable sample is inherently a driver concern (the reference
renders through tablewriter the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_WRAP_LENGTH = 64

_RESET = "\x1b[0m"
_BOLD = "\x1b[1m"
_FG_GREEN = "\x1b[92m"   # FgHiGreenColor: original value of a changed cell
_FG_RED = "\x1b[91m"     # FgHiRedColor: transformed value of a changed cell
_BG_RED = "\x1b[41m"     # BgRedColor: affected headers / changed col cells


def _wrap(s: str, width: int = MAX_WRAP_LENGTH) -> list[str]:
    if s == "":
        return [""]
    return [s[i:i + width] for i in range(0, len(s), width)]


def _fmt_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "t" if v else "f"
    return str(v)


class _AsciiTable:
    """Minimal tablewriter-style renderer: +--+ borders, a row line after
    every record, first-column auto-merge, per-cell ANSI colors applied
    after width computation (so colors never skew padding)."""

    def __init__(self, header: list[str], header_colors: list[str | None]):
        self.header = header
        self.header_colors = header_colors
        self.rows: list[tuple[list[str], list[str | None]]] = []

    def add_row(self, cells: list[str], colors: list[str | None]):
        self.rows.append(([_fmt_cell(c) for c in cells], colors))

    def render(self, color: bool) -> str:
        ncol = len(self.header)
        # auto-merge column 0: blank repeated values (tablewriter
        # SetAutoMergeCellsByColumnIndex([0]))
        prev0 = object()
        merged: list[tuple[list[str], list[str | None]]] = []
        for cells, colors in self.rows:
            cells = list(cells)
            if cells[0] == prev0:
                cells[0] = ""
            else:
                prev0 = cells[0]
            merged.append((cells, colors))
        wrapped = [
            ([_wrap(c) for c in cells], colors) for cells, colors in merged
        ]
        widths = [len(self.header[i]) for i in range(ncol)]
        for cells, _ in wrapped:
            for i, lines in enumerate(cells):
                widths[i] = max(widths[i], *(len(ln) for ln in lines))
        sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"

        def paint(text: str, code: str | None) -> str:
            if not color or not code:
                return text
            return f"{code}{text}{_RESET}"

        def emit(cells: list[list[str]], colors: list[str | None]) -> list[str]:
            height = max(len(c) for c in cells)
            out = []
            for ln in range(height):
                parts = []
                for i, lines in enumerate(cells):
                    cell = lines[ln] if ln < len(lines) else ""
                    parts.append(" " + paint(cell.ljust(widths[i]),
                                             colors[i]) + " ")
                out.append("|" + "|".join(parts) + "|")
            return out

        lines = [sep]
        lines += emit(
            [_wrap(h) for h in self.header],
            [c if c else (_BOLD if color else None)
             for c in self.header_colors],
        )
        lines.append(sep)
        for cells, colors in wrapped:
            lines += emit(cells, colors)
            lines.append(sep)
        return "\n".join(lines) + "\n"


def _sample_pairs(
    original: DataFrame,
    transformed: DataFrame,
    pk: list[str],
    columns: list[str],
    limit: int,
):
    """Collect up to ``limit`` (original, transformed) row pairs joined on
    the PK — ordered by PK so the sample is deterministic."""
    o = original.select(
        *[F.col(k).alias(f"__pk_{k}") for k in pk],
        *[F.col(c).alias(f"o_{c}") for c in columns],
    )
    t = transformed.select(
        *[F.col(k).alias(f"__tk_{k}") for k in pk],
        *[F.col(c).alias(f"t_{c}") for c in columns],
    )
    cond = None
    for k in pk:
        c = F.col(f"__pk_{k}") == F.col(f"__tk_{k}")
        cond = c if cond is None else (cond & c)
    rows = (
        o.join(t, cond)
        .orderBy(*[f"__pk_{k}" for k in pk])
        .limit(limit)
        .collect()
    )
    return [
        (
            {c: r[f"o_{c}"] for c in columns},
            {c: r[f"t_{c}"] for c in columns},
        )
        for r in rows
    ]


def render_diff_text(
    original: DataFrame,
    transformed: DataFrame,
    pk: list[str],
    columns: list[str] | None = None,
    affected: list[str] | None = None,
    table_format: str = "horizontal",
    with_diff: bool = True,
    limit: int = 10,
    color: bool = False,
    schema: str = "public",
    table: str = "table",
) -> str:
    """Render the validate diff sample as the reference's text document."""
    if table_format not in ("horizontal", "vertical"):
        raise ValueError(f"unknown table format {table_format!r}")
    columns = columns or [c for c in original.columns if c not in pk]
    affected = affected if affected is not None else columns
    pairs = _sample_pairs(original, transformed, pk, columns, limit)

    # unexpectedly changed: a column differing anywhere in the sample
    # while not declared affected (validate_utils/utils.go:14-57)
    changed_any = {
        c: any(o[c] != t[c] for o, t in pairs) for c in columns
    }
    unexpected = {c for c in columns if changed_any[c] and c not in affected}

    def colname(c: str) -> str:
        return f"{c} (!!!)" if c in unexpected else c

    title = f'\n\n\t"{schema}"."{table}"\n'
    if table_format == "vertical":
        if with_diff:
            header = ["%LineNum%", "Column", "OriginalValue",
                      "TransformedValue"]
        else:
            header = ["%LineNum%", "Column", "Value"]
        tab = _AsciiTable(header, [None] * len(header))
        for line_idx, (orig, tran) in enumerate(pairs):
            for c in columns:
                equal = orig[c] == tran[c]
                if with_diff:
                    cells = [str(line_idx), colname(c),
                             _fmt_cell(orig[c]), _fmt_cell(tran[c])]
                    colors = [None,
                              None if equal else _BG_RED,
                              None if equal else _FG_GREEN,
                              None if equal else _FG_RED]
                else:
                    cells = [str(line_idx), colname(c), _fmt_cell(tran[c])]
                    colors = [None,
                              None if equal else _BG_RED,
                              None if equal else _FG_RED]
                tab.add_row(cells, colors)
        return title + tab.render(color)

    header = ["%LineNum%"] + [colname(c) for c in columns]
    header_colors: list[str | None] = [None] + [
        _BG_RED if c in affected else None for c in columns
    ]
    tab = _AsciiTable(header, header_colors)
    for line_idx, (orig, tran) in enumerate(pairs):
        if with_diff:
            tab.add_row(
                [str(line_idx)] + [_fmt_cell(orig[c]) for c in columns],
                [None] + [None if orig[c] == tran[c] else _FG_GREEN
                          for c in columns],
            )
        tab.add_row(
            [str(line_idx)] + [_fmt_cell(tran[c]) for c in columns],
            [None] + [None if orig[c] == tran[c] else _FG_RED
                      for c in columns],
        )
    return title + tab.render(color)
