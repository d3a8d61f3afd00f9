"""Per-host politeness token buckets (epoch-refilled, deterministic).

The crawl proceeds in epochs (BSP rounds); each host earns ``refill``
tokens per epoch up to ``capacity``.  A fetch consumes one token.  Token
state is a pure function of the grant sequence → identical across oracle
and shards.
"""

from __future__ import annotations


class TokenBuckets:
    def __init__(self, capacity: int = 4, refill: int = 2) -> None:
        self.capacity = capacity
        self.refill = refill
        self.level: dict[str, int] = {}

    def tick(self) -> None:
        """Epoch boundary: refill every known host."""
        for h in self.level:
            self.level[h] = min(self.capacity, self.level[h] + self.refill)

    def available(self, host: str) -> int:
        return self.level.setdefault(host, self.capacity)

    def consume(self, host: str, n: int = 1) -> bool:
        cur = self.available(host)
        if cur < n:
            return False
        self.level[host] = cur - n
        return True

    def state(self) -> dict:
        return {"capacity": self.capacity, "refill": self.refill,
                "level": dict(self.level)}

    @classmethod
    def from_state(cls, st: dict) -> "TokenBuckets":
        tb = cls(int(st["capacity"]), int(st["refill"]))
        tb.level = {str(k): int(v) for k, v in st["level"].items()}
        return tb
