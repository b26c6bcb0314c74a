// SPDX-License-Identifier: MIT
pragma solidity >=0.8.21;

/// BN254 scalar field arithmetic (mirror of jolt-evm-verifier Fr.sol
/// behavior; written against the jolt_tpu host field, field/host.py).
type Fr is uint256;

using {frAdd as +, frSub as -, frMul as *, frEq as ==, frNeq as !=} for Fr global;

uint256 constant FR_MODULUS =
    21888242871839275222246405745257275088548364400416034343698204186575808495617;

function frAdd(Fr a, Fr b) pure returns (Fr) {
    return Fr.wrap(addmod(Fr.unwrap(a), Fr.unwrap(b), FR_MODULUS));
}

function frSub(Fr a, Fr b) pure returns (Fr) {
    return Fr.wrap(addmod(Fr.unwrap(a), FR_MODULUS - (Fr.unwrap(b) % FR_MODULUS), FR_MODULUS));
}

function frMul(Fr a, Fr b) pure returns (Fr) {
    return Fr.wrap(mulmod(Fr.unwrap(a), Fr.unwrap(b), FR_MODULUS));
}

function frEq(Fr a, Fr b) pure returns (bool) {
    return Fr.unwrap(a) == Fr.unwrap(b);
}

function frNeq(Fr a, Fr b) pure returns (bool) {
    return Fr.unwrap(a) != Fr.unwrap(b);
}

library FrLib {
    function from(uint256 v) internal pure returns (Fr) {
        return Fr.wrap(v % FR_MODULUS);
    }

    function fromBytes32(bytes32 v) internal pure returns (Fr) {
        return Fr.wrap(uint256(v) % FR_MODULUS);
    }

    function unwrap(Fr v) internal pure returns (uint256) {
        return Fr.unwrap(v);
    }

    /// Modular inverse via the modexp precompile (0x05): a^(p-2) mod p.
    function invert(Fr v) internal view returns (Fr) {
        (bool ok, bytes memory out) = address(0x05).staticcall(
            abi.encode(32, 32, 32, Fr.unwrap(v), FR_MODULUS - 2, FR_MODULUS));
        require(ok, "modexp failed");
        return Fr.wrap(abi.decode(out, (uint256)));
    }

    function pow(Fr base, uint256 e) internal view returns (Fr) {
        (bool ok, bytes memory out) = address(0x05).staticcall(
            abi.encode(32, 32, 32, Fr.unwrap(base), e, FR_MODULUS));
        require(ok, "modexp failed");
        return Fr.wrap(abi.decode(out, (uint256)));
    }
}
