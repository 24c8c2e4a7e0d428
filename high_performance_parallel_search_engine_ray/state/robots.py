"""Per-host robots rules.

The reference *claims* robots compliance in docs only
(`Serial Version/docs/architecture.md:26`) with zero implementation; the
north rule requires real robots gating, so the synthetic corpus carries a
``robots`` table (FIXTURES.md §4: host, disallow prefixes, crawl_delay_ms)
and each frontier shard caches the rules for the hosts it owns.
"""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_CRAWL_DELAY_MS = 350  # midpoint of the reference's 200-500ms sleep
                              # (`Serial Version/src/crawler.c:1380`)


@dataclass
class HostRules:
    disallow: tuple[str, ...] = ()
    crawl_delay_ms: int = DEFAULT_CRAWL_DELAY_MS


@dataclass
class RobotsCache:
    rules: dict[str, HostRules] = field(default_factory=dict)

    @classmethod
    def from_rows(cls, rows) -> "RobotsCache":
        """rows: iterable of dicts with host / disallow / crawl_delay_ms."""
        cache = cls()
        for r in rows:
            cache.rules[r["host"]] = HostRules(
                disallow=tuple(r.get("disallow") or ()),
                crawl_delay_ms=int(r.get("crawl_delay_ms") or DEFAULT_CRAWL_DELAY_MS),
            )
        return cache

    def allowed(self, host: str, url: str) -> bool:
        hr = self.rules.get(host)
        if hr is None:
            return True
        path = _path_of(url)
        return not any(path.startswith(p) for p in hr.disallow)

    def crawl_delay_ms(self, host: str) -> int:
        hr = self.rules.get(host)
        return hr.crawl_delay_ms if hr else DEFAULT_CRAWL_DELAY_MS


def _path_of(url: str) -> str:
    _, sep, rest = url.partition("://")
    if not sep:
        return url
    slash = rest.find("/")
    return rest[slash:] if slash != -1 else "/"
