"""Host-side exact number theory: prime generation, roots of unity, CRT."""
