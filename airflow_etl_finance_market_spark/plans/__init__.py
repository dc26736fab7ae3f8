from .volatility import daily_pct_change, top_avg_volatility, weekly_volatility

__all__ = ["daily_pct_change", "weekly_volatility", "top_avg_volatility"]
