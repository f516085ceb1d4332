"""Device mesh + GSPMD sharding helpers."""
