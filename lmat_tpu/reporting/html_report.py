"""HTML sample reports.

genusspecies2html() — byte-compatible with the reference's drill-down report
(/root/reference/bin/genusspecies2html.py:1-196): species/strain and genus
rows interleaved by weighted score, colored by clade (virus/bacteria/fungi/
eukaryote x genus/species/strain shades, plasmid green, human pink), lineage
rank + identity columns.

report_html() — a modern standalone page for the same inputs (this
framework's own format).
"""

from __future__ import annotations

import html

# the reference's clade palette (genusspecies2html.py:44-59), including its
# literal "#00000FF" bacteria-strain value (kept for byte identity)
_HOMO = "#FFCCCC"
_VIRSTR, _VIRSPE, _VIRGEN = "#FF0000", "#990033", "#660000"
_FUNSTR, _FUNSPE, _FUNGEN = "#CCCCCC", "#999966", "#666633"
_PLASMID = "#00CC00"
_BACSTR, _BACSPE, _BACGEN = "#00000FF", "#0033CC", "#000066"
_EUKSTR, _EUKSPE, _EUKGEN = "#FF00FF", "#CC00CC", "#990099"


def genusspecies2html(species_path: str, genus_path: str, rank_path: str,
                      out) -> None:
    """Write the reference drill-down HTML report to the text stream `out`.

    Byte-identical port of /root/reference/bin/genusspecies2html.py: the
    rank file maps "...,taxid=N,..."-keyed lines to lineage columns; species
    rows with >5 tab fields are top-strain rows (fields 4:8), else species
    (fields 0:4); genus rows are merged in weighted-score order; every cell
    row renders with the clade color logic of lines 100-146."""
    lineage: dict[str, list[str]] = {}
    with open(rank_path) as rank_f:
        for line in rank_f:
            parts = line.split("\t")
            tid = parts[0].split(",")[1].split("=")[1]
            lineage[tid] = parts[1:]

    print_ = lambda s="": out.write(s + "\n")
    print_("<html>")
    print_("<body>")
    print_("<table border=2>")

    speciesarr = []
    allarr = []
    with open(species_path) as speciesf:
        for line in speciesf:
            parts = line.split("\t")
            if len(parts) > 5:
                item = parts[4:8]
                item.append("strain")
            else:
                item = parts[0:4]
                item.append("species")
            item.append(lineage[item[2]])
            speciesarr.append(item)

    i = 0
    with open(genus_path) as genusf:
        for line in genusf:
            parts = line.split("\t")
            item = parts[0:4]
            item.append("genus")
            item.append(lineage[parts[2]])
            while i < len(speciesarr) and float(speciesarr[i][0]) >= float(parts[0]):
                allarr.append(speciesarr[i])
                i += 1
            allarr.append(item)

    for data in allarr:
        fgcolor = "#FFFFFF"
        if len(data) < 6:
            color, fgcolor = "#FFFFFF", "#000000"
        elif "plasmid" in data[5][-1]:
            color, fgcolor = _PLASMID, "#000000"
        elif "Homo" in data[5][-1]:
            color, fgcolor = _HOMO, "#000000"
        elif "Virus" in data[5][0]:
            color = {"genus": _VIRGEN, "species": _VIRSPE}.get(data[4], _VIRSTR)
        elif len(data[5]) > 1 and "Bacteria" in data[5][1]:
            color = {"genus": _BACGEN, "species": _BACSPE}.get(data[4], _BACSTR)
        elif len(data[5]) > 3 and "Fungi" in data[5][3]:
            if data[4] == "genus":
                color = _FUNGEN
            elif data[4] == "species":
                color = _FUNSPE
            else:
                color, fgcolor = _FUNSTR, "#000000"
        else:
            color = {"genus": _EUKGEN, "species": _EUKSPE}.get(data[4], _EUKSTR)

        print_("  <tr>")
        rank = data[4]
        for n in data[0:3]:
            print_('    <td bgcolor="' + color + '">')
            print_("<b><font color=" + fgcolor + ">" + n + "</font></b></td>")
        if "," in data[3]:
            ident = data[3].split(",")[1]
        else:
            ident = data[3]
        print_('    <td bgcolor="' + color + '">')
        print_("<b><font color=" + fgcolor + ">" + rank + "</font></b></td>")
        print_('    <td bgcolor="' + color + '">')
        print_("<b><font color=" + fgcolor + ">" + ident + "</font></b></td>")
        print_("  </tr>")

    print_("</table>")
    print_("</body>")
    print_("</html>")


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
