"""End-to-end pipeline composition (declarative DataFrame plans)."""
