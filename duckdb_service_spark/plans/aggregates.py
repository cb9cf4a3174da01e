"""Placeholder — populated incrementally this round."""
