"""Test doubles: loopback servers and fake clients for connector operators."""
