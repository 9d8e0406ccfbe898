"""Deterministic synthetic site graphs (FIXTURES.md §3).

Mirrors the reference's folder-tree enumeration semantics
(SharePointClient.cs:265-335): each node's response lists files then
folders, each with an in-response sibling index; expected crawl order is
pre-order DFS (files of a node before any subfolder subtree).

All generation is seeded; the expected order is computed by a plain
python reference walk — the independent oracle the Spark engine must
reproduce.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field


@dataclass
class Node:
    url: str
    kind: str  # file | folder
    children: list["Node"] = field(default_factory=list)


def balanced_tree(
    host: str = "site.example.com",
    depth: int = 3,
    files_per_folder: int = 3,
    folders_per_folder: int = 2,
    scheme: str = "https",
) -> Node:
    root = Node(f"{scheme}://{host}/lib", "folder")

    def grow(node: Node, d: int) -> None:
        for i in range(files_per_folder):
            node.children.append(Node(f"{node.url}/doc{i}.pdf", "file"))
        if d < depth:
            for j in range(folders_per_folder):
                sub = Node(f"{node.url}/sub{j}", "folder")
                node.children.append(sub)
                grow(sub, d + 1)

    grow(root, 1)
    return root


def ragged_tree(seed: int = 42, host: str = "ragged.example.com") -> Node:
    rng = random.Random(seed)
    root = Node(f"https://{host}/r", "folder")

    def grow(node: Node, d: int) -> None:
        for i in range(rng.randint(0, 4)):
            node.children.append(Node(f"{node.url}/f{i}.pdf", "file"))
        if d < 4:
            for j in range(rng.randint(0, 3)):
                sub = Node(f"{node.url}/d{j}", "folder")
                node.children.append(sub)
                grow(sub, d + 1)

    grow(root, 1)
    return root


def edges_from_tree(root: Node) -> list[tuple[str, str, str, int]]:
    """(parent_url, child_url, kind, sibling_idx) rows; sibling_idx is
    the in-response position with files listed before folders, as the
    reference's loop consumes them (:265 files, :325 folders)."""
    rows: list[tuple[str, str, str, int]] = []

    def walk(node: Node) -> None:
        files = [c for c in node.children if c.kind == "file"]
        folders = [c for c in node.children if c.kind == "folder"]
        for i, c in enumerate(files):
            rows.append((node.url, c.url, "file", i))
        for j, c in enumerate(folders):
            rows.append((node.url, c.url, "folder", j))
            walk(c)

    walk(root)
    return rows


def expected_preorder(root: Node) -> list[str]:
    """The reference's yield order: pre-order DFS, files first."""
    out = [root.url]

    def walk(node: Node) -> None:
        files = [c for c in node.children if c.kind == "file"]
        folders = [c for c in node.children if c.kind == "folder"]
        for c in files:
            out.append(c.url)
        for c in folders:
            out.append(c.url)
            walk(c)

    walk(root)
    return out


def add_cross_links_and_cycle(
    edges: list[tuple[str, str, str, int]], root_url: str
) -> list[tuple[str, str, str, int]]:
    """Graph-ify the tree: cross-link to an already-seen node and a back
    edge to the root (a cycle). The reference never sees these (trees
    only); our engine must dedup and terminate (FIXTURES.md §3)."""
    out = list(edges)
    folders = [e[1] for e in edges if e[2] == "folder"]
    if len(folders) >= 2:
        a, b = folders[0], folders[-1]
        next_idx = max((e[3] for e in out if e[0] == b and e[2] == "folder"), default=-1) + 1
        out.append((b, a, "folder", next_idx))  # cross-link
        out.append((a, root_url, "folder", 99))  # cycle back to root
    return out
