// SPDX-License-Identifier: MIT
pragma solidity >=0.8.21;

import {Fr, FrLib} from "./Fr.sol";
import {Transcript, FiatShamirTranscript} from "./FiatShamirTranscript.sol";

/// Sumcheck round-poly verification, mirroring
/// jolt_tpu/subprotocols/sumcheck.py SumcheckInstanceProof.verify
/// (reference sumcheck.rs:495-552 + unipoly.rs:218-247): round polys are
/// transmitted WITHOUT their linear coefficient, which the verifier
/// reconstructs from the previous round's claim (hint = f(0) + f(1)).
library SumcheckVerifier {
    using FiatShamirTranscript for Transcript;

    struct CompressedUniPoly {
        // [c0, c2, c3, ..., cd] — every coefficient except the linear one
        Fr[] coeffsExceptLinear;
    }

    struct SumcheckProof {
        CompressedUniPoly[] rounds;
    }

    function appendToTranscript(Transcript memory t, CompressedUniPoly memory p)
        internal
        pure
    {
        t.appendBytes32("UniPoly_begin");
        for (uint256 i = 0; i < p.coeffsExceptLinear.length; i++) {
            t.appendScalar(Fr.unwrap(p.coeffsExceptLinear[i]));
        }
        t.appendBytes32("UniPoly_end");
    }

    /// linear = hint - 2*c0 - sum(c2..cd); evaluate with Horner-style powers.
    function evalFromHint(CompressedUniPoly memory p, Fr hint, Fr x)
        internal
        pure
        returns (Fr)
    {
        Fr[] memory c = p.coeffsExceptLinear;
        Fr linear = hint - c[0] - c[0];
        for (uint256 i = 1; i < c.length; i++) {
            linear = linear - c[i];
        }
        Fr runningPoint = x;
        Fr runningSum = c[0] + x * linear;
        for (uint256 i = 1; i < c.length; i++) {
            runningPoint = runningPoint * x;
            runningSum = runningSum + c[i] * runningPoint;
        }
        return runningSum;
    }

    /// Replays the transcript; returns (final expected claim, challenges r).
    function verify(
        SumcheckProof memory proof,
        Fr claim,
        uint256 numRounds,
        uint256 degreeBound,
        Transcript memory t
    ) internal pure returns (Fr, Fr[] memory) {
        require(proof.rounds.length == numRounds, "wrong round count");
        Fr e = claim;
        Fr[] memory r = new Fr[](numRounds);
        for (uint256 i = 0; i < numRounds; i++) {
            // compressed degree-d poly carries d coefficients
            require(proof.rounds[i].coeffsExceptLinear.length == degreeBound,
                    "degree bound");
            appendToTranscript(t, proof.rounds[i]);
            Fr ri = t.challengeScalar();
            r[i] = ri;
            e = evalFromHint(proof.rounds[i], e, ri);
        }
        return (e, r);
    }
}
