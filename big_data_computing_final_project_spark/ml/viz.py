"""M14 — tree & feature-importance visualization (SURVEY.md §2.8).

The reference renders its fitted tree as matplotlib boxes and as sklearn's
``export_graphviz`` PDF (`house_predict.py:420-556`,
`house_predict_model.ipynb` cells 6c35cadf/a14b6c11). This container has no
plotting libraries, so the engine ships the format every graphviz toolchain
renders instead: a dependency-free DOT exporter over the fitted
``pyspark.ml`` tree (``dot -Tpng out.dot`` reproduces the reference's
figure), plus a terminal bar chart for feature importances. Both are
driver-side formatting of an already-fitted model — no Spark jobs, no data
movement; model size is O(nodes), never O(rows).
"""

from __future__ import annotations

from typing import Sequence


def _dot_escape(s: str) -> str:
    """Escape a string for a double-quoted DOT label (caller-supplied
    feature names may contain quotes/backslashes)."""
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _node_label(node, feature_names: Sequence[str] | None, digits: int) -> str:
    """Label one java tree node the way sklearn's export_graphviz does:
    split condition (internal nodes), impurity, prediction."""
    impurity = round(node.impurity(), digits)
    pred = node.prediction()
    cls = node.getClass().getSimpleName()
    if cls.startswith("InternalNode"):
        split = node.split()
        fi = split.featureIndex()
        name = feature_names[fi] if feature_names and fi < len(feature_names) else f"feature_{fi}"
        name = _dot_escape(name)
        scls = split.getClass().getSimpleName()
        if scls.startswith("ContinuousSplit"):
            cond = f"{name} <= {round(split.threshold(), digits)}"
        else:
            cats = sorted(split.leftCategories())
            cond = f"{name} in {{{', '.join(str(int(c)) for c in cats)}}}"
        return f"{cond}\\nimpurity = {impurity}\\npredict = {pred}"
    return f"impurity = {impurity}\\npredict = {pred}"


def tree_to_dot(
    model,
    feature_names: Sequence[str] | None = None,
    digits: int = 4,
) -> str:
    """DOT source for a fitted ``DecisionTreeClassificationModel`` /
    ``DecisionTreeRegressionModel`` (also accepts one tree of a forest via
    ``model.trees[i]``). Traverses the public ``rootNode`` tree; left edge
    is the split's true branch (labeled like sklearn's figure)."""
    root = model._call_java("rootNode")
    lines = [
        "digraph Tree {",
        'node [shape=box, style="rounded", fontname="helvetica"];',
        'edge [fontname="helvetica"];',
    ]
    counter = [0]

    def walk(node) -> int:
        nid = counter[0]
        counter[0] += 1
        lines.append(f'{nid} [label="{_node_label(node, feature_names, digits)}"];')
        if node.getClass().getSimpleName().startswith("InternalNode"):
            lid = walk(node.leftChild())
            rid = walk(node.rightChild())
            ltag = ' [labeldistance=2.5, labelangle=45, headlabel="True"]' if nid == 0 else ""
            rtag = ' [labeldistance=2.5, labelangle=-45, headlabel="False"]' if nid == 0 else ""
            lines.append(f"{nid} -> {lid}{ltag};")
            lines.append(f"{nid} -> {rid}{rtag};")
        return nid

    walk(root)
    lines.append("}")
    return "\n".join(lines)


def render_dot(
    dot: str,
    out_path: str,
    fmt: str | None = None,
) -> str:
    """Render a DOT string to an image via the system ``dot`` binary — the
    optional closing of the reference's PNG/PDF artifacts
    (`house_predict_model.ipynb` cell a14b6c11: ``export_graphviz`` →
    pydotplus PNG). Purely driver-side; raises FileNotFoundError with a
    clear message when graphviz is not installed (callers treat the DOT
    string as the portable artifact, exactly like the reference repos that
    commit .dot files). ``fmt`` defaults to ``out_path``'s extension."""
    import shutil
    import subprocess

    import os

    exe = shutil.which("dot")
    if exe is None:
        raise FileNotFoundError(
            "graphviz 'dot' binary not found: install graphviz to render, "
            "or use the DOT string directly (tree_to_dot output)"
        )
    if fmt is None:
        base = os.path.basename(out_path)
        if "." not in base:
            raise ValueError(
                f"cannot infer render format from {out_path!r}: pass fmt="
            )
        fmt = base.rsplit(".", 1)[-1]
    proc = subprocess.run(
        [exe, f"-T{fmt}", "-o", out_path],
        input=dot.encode(),
        capture_output=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"dot -T{fmt} failed ({proc.returncode}): "
            f"{proc.stderr.decode(errors='replace').strip()}"
        )
    return out_path


def importance_bars(
    model,
    feature_names: Sequence[str],
    width: int = 40,
) -> str:
    """The reference's feature-importance bar figure as terminal text:
    one line per feature, sorted descending, bar scaled to the max
    importance (`house_predict.py:518-556`). Works for any fitted model
    exposing ``featureImportances`` (DT/RF/GBT)."""
    imp = model.featureImportances
    pairs = sorted(
        ((feature_names[i] if i < len(feature_names) else f"feature_{i}", float(imp[i]))
         for i in range(imp.size)),
        key=lambda kv: (-kv[1], kv[0]),
    )
    top = max((v for _, v in pairs), default=0.0)
    namew = max((len(n) for n, _ in pairs), default=0)
    out = []
    for name, v in pairs:
        bar = "#" * (round(v / top * width) if top > 0 else 0)
        out.append(f"{name.ljust(namew)}  {v:8.4f}  {bar}")
    return "\n".join(out)
