"""TPU compute ops: attention core (XLA + Pallas flash), preprocessing."""
