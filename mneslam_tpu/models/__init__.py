"""Neural models: tri-plane scene representation, decoders, tracker nets."""
