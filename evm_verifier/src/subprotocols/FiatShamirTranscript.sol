// SPDX-License-Identifier: MIT
pragma solidity >=0.8.21;

import {Fr, FrLib, FR_MODULUS} from "./Fr.sol";

/// Keccak-256 Fiat-Shamir transcript, byte-exact with jolt_tpu/transcript.py
/// (itself byte-exact with jolt-core/src/utils/transcript.rs:8-210):
///   state      = keccak256(label right-padded to 32 bytes)
///   each event = keccak256(state || uint256(n_rounds) || payload)
///   challenge  = event with empty payload; scalar = uint256(hash) mod p
struct Transcript {
    bytes32 state;
    uint256 nRounds;
}

library FiatShamirTranscript {
    function newTranscript(bytes32 encodedLabel) internal pure returns (Transcript memory t) {
        t.state = keccak256(abi.encodePacked(encodedLabel));
        t.nRounds = 0;
    }

    function _update(Transcript memory t, bytes32 h) private pure {
        t.state = h;
        t.nRounds += 1;
    }

    /// 32-byte message (labels are right-padded string literals).
    function appendBytes32(Transcript memory t, bytes32 added) internal pure {
        _update(t, keccak256(abi.encodePacked(t.state, t.nRounds, added)));
    }

    /// Raw unpadded bytes (transcript.rs append_bytes).
    function appendBytes(Transcript memory t, bytes memory data) internal pure {
        _update(t, keccak256(abi.encodePacked(t.state, t.nRounds, data)));
    }

    function appendU64(Transcript memory t, uint64 x) internal pure {
        appendBytes32(t, bytes32(uint256(x)));
    }

    /// WARN: caller ensures the scalar is a canonical residue (top bits 0).
    function appendScalar(Transcript memory t, uint256 s) internal pure {
        appendBytes32(t, bytes32(s));
    }

    function appendVector(Transcript memory t, uint256[] memory v) internal pure {
        appendBytes32(t, "begin_append_vector");
        for (uint256 i = 0; i < v.length; i++) {
            appendBytes32(t, bytes32(v[i]));
        }
        appendBytes32(t, "end_append_vector");
    }

    /// Affine point as x || y (64 bytes, one round); infinity = 64 zero bytes.
    function appendPoint(Transcript memory t, uint256 x, uint256 y) internal pure {
        _update(t, keccak256(abi.encodePacked(t.state, t.nRounds, x, y)));
    }

    function appendPoints(Transcript memory t, uint256[] memory xy) internal pure {
        appendBytes32(t, "begin_append_vector");
        for (uint256 i = 0; i < xy.length; i += 2) {
            appendPoint(t, xy[i], xy[i + 1]);
        }
        appendBytes32(t, "end_append_vector");
    }

    function challengeBytes32(Transcript memory t) internal pure returns (bytes32 rand) {
        rand = keccak256(abi.encodePacked(t.state, t.nRounds));
        _update(t, rand);
    }

    function challengeScalar(Transcript memory t) internal pure returns (Fr) {
        return FrLib.fromBytes32(challengeBytes32(t));
    }

    function challengeVector(Transcript memory t, uint256 n) internal pure returns (Fr[] memory out) {
        out = new Fr[](n);
        for (uint256 i = 0; i < n; i++) {
            out[i] = challengeScalar(t);
        }
    }

    function challengeScalarPowers(Transcript memory t, uint256 n) internal pure returns (Fr[] memory out) {
        Fr q = challengeScalar(t);
        out = new Fr[](n);
        out[0] = FrLib.from(1);
        for (uint256 i = 1; i < n; i++) {
            out[i] = out[i - 1] * q;
        }
    }
}
