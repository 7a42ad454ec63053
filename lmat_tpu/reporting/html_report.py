"""HTML sample report (genusspecies2html.py equivalent): genus/species rank
tables rendered as a standalone HTML page."""

from __future__ import annotations

import html


def report_html(species_path: str, genus_path: str, out_path: str,
                title: str = "lmat_tpu classification report"):
    def table(path, caption):
        with open(path) as f:
            lines = [l.rstrip("\n").split("\t") for l in f if l.strip()]
        if not lines:
            return f"<p>no rows in {html.escape(path)}</p>"
        head = lines[0]
        body = lines[1:]
        out = [f"<h2>{html.escape(caption)}</h2>", "<table>", "<tr>"]
        out += [f"<th>{html.escape(h)}</th>" for h in head]
        out.append("</tr>")
        for row in body:
            out.append(
                "<tr>" + "".join(f"<td>{html.escape(c)}</td>" for c in row) + "</tr>"
            )
        out.append("</table>")
        return "\n".join(out)

    doc = f"""<!doctype html>
<html><head><meta charset="utf-8"><title>{html.escape(title)}</title>
<style>
body {{ font-family: sans-serif; margin: 2em; }}
table {{ border-collapse: collapse; margin-bottom: 2em; }}
th, td {{ border: 1px solid #999; padding: 4px 8px; font-size: 13px; }}
th {{ background: #eee; }}
tr:nth-child(even) {{ background: #f7f7f7; }}
</style></head><body>
<h1>{html.escape(title)}</h1>
{table(species_path, "Species-level calls")}
{table(genus_path, "Genus-level calls")}
</body></html>
"""
    with open(out_path, "w") as f:
        f.write(doc)
    return out_path
