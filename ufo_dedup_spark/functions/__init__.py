"""Column expressions and pandas UDFs used by the engine's operators."""
