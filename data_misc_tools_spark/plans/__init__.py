"""SQL script parsing/execution (the Beeline-emulation path)."""
