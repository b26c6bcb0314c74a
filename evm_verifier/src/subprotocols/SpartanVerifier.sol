// SPDX-License-Identifier: MIT
pragma solidity >=0.8.21;

import {Fr, FrLib} from "./Fr.sol";
import {Transcript, FiatShamirTranscript} from "./FiatShamirTranscript.sol";
import {SumcheckVerifier} from "./SumcheckVerifier.sol";
import {R1CSMatrix} from "./R1CSMatrix.sol";

/// Uniform-Spartan R1CS verification (mirror of vm/r1cs.py spartan_verify;
/// reference spartan.rs:215-298 + jolt-evm-verifier SpartanVerifier.sol).
///
/// Unlike the reference Solidity (which hardcodes the three matrix MLE
/// values behind a TODO), this verifier evaluates A/B/C via the generated
/// R1CSMatrix library, so it is complete for any trace length.
/// The reduced-opening PCS check is accumulated by the caller (the openings
/// feed the batched HyperKZG verification), matching the Rust flow where
/// spartan appends its claims to the opening accumulator.
library SpartanVerifier {
    using FiatShamirTranscript for Transcript;

    struct SpartanProof {
        SumcheckVerifier.SumcheckProof outer;
        Fr outerClaimAz;
        Fr outerClaimBz;
        Fr outerClaimCz;
        SumcheckVerifier.SumcheckProof inner;
        Fr[] claimedWitnessEvals; // one per witness column, R1CSMatrix.NUM_VARS
    }

    /// Verifies both Spartan sumchecks and the closed-form matrix/Z claim.
    /// stepsBits = log2(padded trace length).  Returns the opening point
    /// (r_col_step) for the caller's opening accumulator.
    function verifySpartan(
        SpartanProof memory proof,
        uint256 stepsBits,
        Transcript memory t
    ) internal pure returns (Fr[] memory openingPoint) {
        uint256 numRoundsX = R1CSMatrix.CONSTR_BITS + stepsBits;
        uint256 numRoundsY = R1CSMatrix.VAR_BITS + 1 + stepsBits;

        Fr[] memory tau = t.challengeVector(numRoundsX);

        (Fr claimOuter, Fr[] memory rX) = SumcheckVerifier.verify(
            proof.outer, Fr.wrap(0), numRoundsX, 3, t);
        // bottom-variable binding: challenges come back reversed
        for (uint256 i = 0; i < rX.length / 2; i++) {
            (rX[i], rX[rX.length - 1 - i]) = (rX[rX.length - 1 - i], rX[i]);
        }

        Fr tausBoundRx = R1CSMatrix.eqEvaluate(tau, 0, rX, 0, numRoundsX);
        require(
            claimOuter
                == tausBoundRx
                    * (proof.outerClaimAz * proof.outerClaimBz - proof.outerClaimCz),
            "Spartan: invalid outer sumcheck"
        );

        t.appendBytes32("begin_append_vector");
        t.appendScalar(Fr.unwrap(proof.outerClaimAz));
        t.appendScalar(Fr.unwrap(proof.outerClaimBz));
        t.appendScalar(Fr.unwrap(proof.outerClaimCz));
        t.appendBytes32("end_append_vector");

        Fr rRlc = t.challengeScalar();
        Fr claimInnerJoint = proof.outerClaimAz + rRlc * proof.outerClaimBz
            + rRlc * rRlc * proof.outerClaimCz;

        (Fr claimInner, Fr[] memory rY) = SumcheckVerifier.verify(
            proof.inner, claimInnerJoint, numRoundsY, 2, t);

        Fr evalZ = R1CSMatrix.evalZMle(rY, proof.claimedWitnessEvals);

        Fr[] memory r = new Fr[](numRoundsX + numRoundsY);
        for (uint256 i = 0; i < numRoundsX; i++) {
            r[i] = rX[i];
        }
        for (uint256 i = 0; i < numRoundsY; i++) {
            r[numRoundsX + i] = rY[i];
        }
        (Fr aEval, Fr bEval, Fr cEval) =
            R1CSMatrix.evaluateR1CSMatrixMles(r, stepsBits);

        Fr left = aEval + rRlc * bEval + rRlc * rRlc * cEval;
        require(claimInner == left * evalZ,
                "Spartan: invalid inner sumcheck claim");

        uint256 nPrefix = R1CSMatrix.VAR_BITS + 1;
        openingPoint = new Fr[](numRoundsY - nPrefix);
        for (uint256 i = 0; i < openingPoint.length; i++) {
            openingPoint[i] = rY[nPrefix + i];
        }
    }
}
