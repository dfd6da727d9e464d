"""System assembly: element families, global operator, simulation state."""
