"""Sequential crawl oracle — the specification of the frontier engine.

A pure-Python walk with the same rules as streaming/frontier.py:
per round, per host, take the top ``budget`` frontier URLs by
(priority desc, urim asc), robots-gated, depth-limited; fetched URLs enter
the seen set (SURT key); outlinks join the frontier unless seen.

Emits the exact pop order (round asc, priority desc, urim asc) and the
final seen set — the BASELINE.md crawl-order/seen-set fidelity contract.
"""

from __future__ import annotations

from urllib.parse import urlsplit


def surt_key_py(url: str) -> str:
    """Mirror of functions/urls.py:surt_key."""
    p = urlsplit(url)
    host = (p.hostname or "").lower()
    path = (p.path or "").lower()
    if path == "":
        path = "/"
    elif len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    q = (p.query or "").lower()
    s = ",".join(reversed(host.split("."))) + ")" + path
    if q:
        s += "?" + q
    return s


def crawl_oracle(
    web_rows: list[dict],
    seed_urims: list[str],
    robots: list[dict] | None = None,
    per_host_budget: int = 4,
    max_depth: int = 3,
    max_rounds: int = 50,
) -> tuple[list[str], set[str]]:
    """→ (pop_order, seen_surt_set)."""
    web = {r["urim"]: r for r in web_rows}
    disallow = {r["host"]: r["disallow"] for r in (robots or [])}

    def allowed(r: dict) -> bool:
        dis = disallow.get(r["host"], [])
        p = urlsplit(r["urir"])
        path = p.path or "/"
        return not any(path.startswith(d) for d in dis)

    frontier: dict[str, dict] = {}
    for u in seed_urims:
        if u in web:
            r = web[u]
            frontier[u] = {
                "urim": u, "urir": r["urir"], "host": r["host"],
                "priority": r["priority"], "depth": 0,
            }
    seen: set[str] = set()
    pop_order: list[str] = []

    for _rnd in range(max_rounds):
        cand = [f for f in frontier.values() if surt_key_py(f["urim"]) not in seen]
        if not cand:
            break
        ok = [f for f in cand if allowed(web[f["urim"]])]
        by_host: dict[str, list[dict]] = {}
        for f in ok:
            by_host.setdefault(f["host"], []).append(f)
        selected: list[dict] = []
        for _host, members in by_host.items():
            members.sort(key=lambda f: (-f["priority"], f["urim"]))
            selected.extend(members[:per_host_budget])
        if not selected:
            break
        # global pop order within the round
        selected.sort(key=lambda f: (-f["priority"], f["urim"]))
        for f in selected:
            pop_order.append(f["urim"])
            seen.add(surt_key_py(f["urim"]))
            del frontier[f["urim"]]
        for f in selected:
            if f["depth"] + 1 > max_depth:
                continue
            for link in web[f["urim"]]["outlinks"]:
                if link not in web:
                    continue
                if surt_key_py(link) in seen:
                    continue
                r = web[link]
                prev = frontier.get(link)
                cand_row = {
                    "urim": link, "urir": r["urir"], "host": r["host"],
                    "priority": r["priority"], "depth": f["depth"] + 1,
                }
                if prev is None:
                    frontier[link] = cand_row
                else:
                    prev["priority"] = max(prev["priority"], cand_row["priority"])
                    prev["depth"] = min(prev["depth"], cand_row["depth"])
    return pop_order, seen
