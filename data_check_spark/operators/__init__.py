"""Set-oriented validation operators + training-data pipeline operators."""
