"""Model stack: layers -> modules -> blocks -> encoders/decoders -> task models."""
