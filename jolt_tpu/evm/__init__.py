"""EVM-verifier fixtures (reference: jolt-evm-verifier/script/src/bin/*)."""
