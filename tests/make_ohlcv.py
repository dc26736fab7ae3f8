"""Deterministic synthetic OHLCV generator for pipeline tests (FIXTURES.md §1.1).

Covers the edge cases the semantics tests need: each ticker's first trading
day (LAG→NULL), a singleton week (stddev_samp→NULL), a zero prior close
(NULLIF path), plus an optional corrupted variant (NULL close/date rows) to
trip the quality gate.
"""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd

TICKERS = ["SYM01", "SYM02", "SYM03"]
START = dt.date(2024, 1, 2)  # a Tuesday — first week is partial
DAYS = 40


def make_ohlcv(corrupt: bool = False) -> pd.DataFrame:
    rows = []
    for ti, sym in enumerate(TICKERS):
        close_prev = 100.0 + 10 * ti
        for d in range(DAYS):
            date = START + dt.timedelta(days=d)
            if date.weekday() >= 5:  # skip weekends: business-day-ish series
                continue
            # deterministic pseudo-walk
            close = round(close_prev * (1 + 0.01 * math.sin(d + ti)), 4)
            if sym == "SYM02" and d == 10:
                close = 0.0  # → next row's pct change hits the NULLIF guard
            o = round(close * 0.995, 4)
            hi = round(max(o, close) * 1.01, 4)
            lo = round(min(o, close) * 0.99, 4)
            rows.append((date, sym, o, hi, lo, close, 1_000_000 + 1000 * d + ti))
            close_prev = close if close != 0 else 100.0
    # singleton week: SYM03 trades once in an isolated later week
    rows.append((START + dt.timedelta(days=70), "SYM03", 1.0, 1.1, 0.9, 1.05, 999))
    df = pd.DataFrame(
        rows, columns=["date", "symbol", "open", "high", "low", "close", "volume"]
    )
    if corrupt:
        df.loc[df.index[3], "close"] = None
        df.loc[df.index[7], "date"] = None
    return df


def write_csv(path: str, corrupt: bool = False) -> int:
    df = make_ohlcv(corrupt=corrupt)
    df.to_csv(path, index=False)
    return len(df)
