"""Static HTML results gallery (reference: src/utils/html.py — an image/
video grid generator; not wired into the trainer there either, provided as
a standalone reporting utility)."""

from __future__ import annotations

from pathlib import Path

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: sans-serif; background: #fafafa; margin: 2em; }}
table {{ border-collapse: collapse; }}
td {{ padding: 6px; text-align: center; vertical-align: top; }}
img, video {{ max-width: {width}px; display: block; }}
.caption {{ font-size: 12px; color: #555; margin-top: 2px; }}
</style></head><body>
<h2>{title}</h2>
{body}
</body></html>
"""


def _cell(path, width):
    p = Path(path)
    if p.suffix.lower() in (".mp4", ".webm"):
        media = (
            f'<video width="{width}" autoplay loop muted>'
            f'<source src="{p}" type="video/mp4"></video>'
        )
    else:
        media = f'<img src="{p}" width="{width}">'
    return f"<td>{media}<div class='caption'>{p.name}</div></td>"


def write_gallery(out_path, rows, title="results", width=256):
    """rows: list of lists of image/video paths (relative to out_path's
    directory). Writes an HTML grid."""
    body = ["<table>"]
    for row in rows:
        body.append("<tr>" + "".join(_cell(c, width) for c in row) + "</tr>")
    body.append("</table>")
    Path(out_path).write_text(
        _PAGE.format(title=title, body="\n".join(body), width=width)
    )
    return out_path


def gallery_from_run_dir(run_dir, out_name="index.html", patterns=("*.png", "*.jpg", "*.mp4"),
                        per_row=6, title=None, width=256):
    """Collect media files from a run directory into a grid page."""
    run_dir = Path(run_dir)
    files = []
    for pat in patterns:
        files += sorted(run_dir.rglob(pat))
    rel = [f.relative_to(run_dir) for f in files]
    rows = [rel[i : i + per_row] for i in range(0, len(rel), per_row)]
    return write_gallery(
        run_dir / out_name, rows, title=title or run_dir.name, width=width
    )
