from .stable import dec, dsum, davg, round_dbl

__all__ = ["dec", "dsum", "davg", "round_dbl"]
