"""Build a static HTML site from the docs markdown (docs/*.md, docs/api/*.md)
into docs/_site — the publish step of the docs pipeline (reference ships a
Sphinx site via .github/workflows/deploy.yml; ours regenerates the API
reference with gen_api.py and renders the markdown).

Uses the `markdown` package when available (installed in CI); falls back to
a <pre> wrapper so the build never fails locally.
"""
from __future__ import annotations

import os
import shutil

HERE = os.path.dirname(os.path.abspath(__file__))
SITE = os.path.join(HERE, "_site")

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — gbrl_tpu</title>
<style>
 body {{ max-width: 56rem; margin: 2rem auto; padding: 0 1rem;
        font: 16px/1.55 system-ui, sans-serif; color: #1a1a1a; }}
 pre, code {{ background: #f6f8fa; border-radius: 4px; }}
 pre {{ padding: .8rem; overflow-x: auto; }}
 code {{ padding: .1rem .3rem; }}
 nav {{ border-bottom: 1px solid #ddd; padding-bottom: .6rem;
        margin-bottom: 1.2rem; }}
 nav a {{ margin-right: 1rem; }}
 table {{ border-collapse: collapse; }}
 th, td {{ border: 1px solid #ccc; padding: .3rem .6rem; }}
</style></head>
<body><nav><a href="{root}index.html">gbrl_tpu docs</a>
<a href="{root}API.html">API</a>
<a href="{root}architecture.html">Architecture</a></nav>
{body}</body></html>
"""


def render(md_text: str) -> str:
    try:
        import markdown
        return markdown.markdown(md_text,
                                 extensions=["tables", "fenced_code"])
    except Exception:
        import html
        return f"<pre>{html.escape(md_text)}</pre>"


def convert(src: str, dst: str, root: str) -> None:
    with open(src) as f:
        text = f.read()
    title = os.path.splitext(os.path.basename(src))[0]
    for line in text.splitlines():
        if line.startswith("# "):
            title = line[2:].strip()
            break
    body = render(text)
    # markdown cross-links -> html
    body = body.replace(".md)", ".html)").replace('.md"', '.html"')
    with open(dst, "w") as f:
        f.write(_PAGE.format(title=title, body=body, root=root))


def main() -> None:
    shutil.rmtree(SITE, ignore_errors=True)
    os.makedirs(os.path.join(SITE, "api"), exist_ok=True)
    for name in os.listdir(HERE):
        if name.endswith(".md"):
            convert(os.path.join(HERE, name),
                    os.path.join(SITE, name[:-3] + ".html"), "")
    for name in os.listdir(os.path.join(HERE, "api")):
        if name.endswith(".md"):
            convert(os.path.join(HERE, "api", name),
                    os.path.join(SITE, "api", name[:-3] + ".html"), "../")
    # index = rendered repo README
    readme = os.path.join(os.path.dirname(HERE), "README.md")
    if os.path.exists(readme):
        convert(readme, os.path.join(SITE, "index.html"), "")
    nb = os.path.join(HERE, "tutorial.ipynb")
    if os.path.exists(nb):
        shutil.copy(nb, os.path.join(SITE, "tutorial.ipynb"))
    print(f"built {SITE}")


if __name__ == "__main__":
    main()
